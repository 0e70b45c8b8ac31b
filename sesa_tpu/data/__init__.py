"""Training data pipeline: datasets, augmentation, batching.

Counterpart of reference models/bandit/core/data/ (datasets + StemAugmentor);
host-side numpy feeding the jitted train step one batch upload per step.
"""

from sesa_tpu.data.augmentation import (AUGMENTATIONS, StemAugmentor,
                                        build_augmentation)
from sesa_tpu.data.datasets import (DnRDataset,
                                    DnRDeterministicChunkDataset,
                                    DnRRandomChunkDataset,
                                    DnRRandomChunkDatasetWithSpeechReverb,
                                    MUSDB18FullTrackDataset,
                                    MUSDB18SadDataset,
                                    MUSDB18SadOnTheFlyAugmentedDataset,
                                    SourceSeparationDataset, batch_iterator)

__all__ = [
    "AUGMENTATIONS", "StemAugmentor", "build_augmentation",
    "SourceSeparationDataset", "MUSDB18FullTrackDataset",
    "MUSDB18SadDataset", "MUSDB18SadOnTheFlyAugmentedDataset",
    "DnRDataset", "DnRRandomChunkDataset", "DnRDeterministicChunkDataset",
    "DnRRandomChunkDatasetWithSpeechReverb", "batch_iterator",
]
