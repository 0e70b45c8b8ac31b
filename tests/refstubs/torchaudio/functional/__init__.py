from .functional import _create_triangular_filterbank, melscale_fbanks  # noqa: F401
