"""LightningModule shim: the reference's bandit models only subclass it
for training conveniences; at inference it is behaviorally nn.Module."""

from torch import nn


class LightningModule(nn.Module):
    pass
