"""spafe bark_fbanks import shim. The reference imports it at module scope
but the registry's bandit checkpoint uses the MUSICAL band layout, so the
bark path never executes in these oracles — calling it raises."""


def bark_filter_banks(*args, **kwargs):
    raise NotImplementedError(
        "refstub spafe: bark band specs are out of oracle scope "
        "(the bandit registry checkpoint uses musical bands)")
