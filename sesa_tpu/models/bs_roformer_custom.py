"""bs_roformer_custom — declarative coverage of community custom roformers.

The reference downloads and executes an arbitrary ``bs_roformer.py`` from
each entry's ``custom_model_url`` (reference model.py:1796-1804) — a code
-execution hole this framework deliberately does not reproduce. Instead,
the known custom families are covered declaratively:

- the HyperACE family (pcunwa/BS-Roformer-HyperACE v1/v2) and
  BS-Roformer-Large-Inst publish lucidrains-style experimental roformers —
  value-residual learning and/or hyper-connections — whose architecture is
  fully described by their config.yaml. Those configs dispatch onto the
  experimental spec machinery (sesa_tpu/models/bs_roformer_experimental.py),
  which supports num_residual_streams > 1 and use_value_residual_learning.
- the FNO variant (pcunwa/BS-Roformer-Inst-FNO, reference model.py:993-1004)
  resolves through the spec's `use_fno` / `fno_modes` options — a standard
  FNO1d spectral-conv stage per depth layer (see bs_roformer._fno_apply),
  oracle-tested against a hand-written torch implementation. Its converter
  fails loudly on any key-layout mismatch with the real upstream checkpoint.
- configs carrying architecture knobs outside that space raise a typed
  UnsupportedCustomArchitecture error naming the unknown keys, instead of
  silently mis-loading.
"""

from __future__ import annotations

from sesa_tpu.models import bs_roformer_experimental as _exp


class UnsupportedCustomArchitecture(NotImplementedError):
    """A custom config uses architecture knobs the declarative spec lacks."""


def _check_spec(config):
    """Validate ONLY the spec construction: an unknown-architecture knob
    raises the dataclass ctor's TypeError here; runtime TypeErrors inside
    the model itself must surface unchanged, not be mislabeled as an
    unsupported architecture."""
    try:
        _exp._spec(config)
    except TypeError as e:
        raise UnsupportedCustomArchitecture(
            "This bs_roformer_custom config is outside the declarative "
            "experimental-roformer space (value residual + hyper-connections). "
            f"Spec error: {e}. Downloaded model code is never executed; "
            "add the missing architecture option to "
            "sesa_tpu/models/bs_roformer_experimental.py instead."
        ) from e


def init(rng, config):
    _check_spec(config)
    return _exp.init(rng, config)


def apply(params, config, x, precision=None, compute_dtype=None):
    _check_spec(config)
    return _exp.apply(params, config, x,
                      precision=precision, compute_dtype=compute_dtype)


def convert_torch(state_dict, config):
    _check_spec(config)
    return _exp.convert_torch(state_dict, config)
