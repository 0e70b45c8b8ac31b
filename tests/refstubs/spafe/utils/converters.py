"""spafe converters shim — imported at module scope by the reference's
bandit utils but only the musical band layout is exercised by the
oracles; these raise if the bark/erb paths are ever reached."""


def _oos(*args, **kwargs):
    raise NotImplementedError("refstub spafe: bark/erb specs out of oracle scope")


erb2hz = hz2bark = hz2erb = _oos
