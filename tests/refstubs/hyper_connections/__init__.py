"""Disable-path-only hyper_connections (see README.md)."""


def get_init_and_expand_reduce_stream_functions(num_streams, disable=False):
    if disable or num_streams == 1:
        def init_hyper_conn(dim=None, branch=None, **kwargs):
            return branch

        def identity(x, *args, **kwargs):
            return x

        return init_hyper_conn, identity, identity
    raise NotImplementedError(
        "refstub hyper_connections supports only the disabled "
        "(num_residual_streams == 1) path")
