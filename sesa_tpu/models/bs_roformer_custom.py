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


def _guarded(fn, config, *args, **kwargs):
    try:
        return fn(*args, **kwargs)
    except TypeError as e:
        known = str(e)
        raise UnsupportedCustomArchitecture(
            "This bs_roformer_custom config is outside the declarative "
            "experimental-roformer space (value residual + hyper-connections). "
            f"Spec error: {known}. Downloaded model code is never executed; "
            "add the missing architecture option to "
            "sesa_tpu/models/bs_roformer_experimental.py instead."
        ) from e


def init(rng, config):
    return _guarded(_exp.init, config, rng, config)


def apply(params, config, x, precision=None, compute_dtype=None):
    return _guarded(_exp.apply, config, params, config, x,
                    precision=precision, compute_dtype=compute_dtype)


def convert_torch(state_dict, config):
    return _guarded(_exp.convert_torch, config, state_dict, config)
