"""prima_tpu: TPU-native distributed LLM serving framework.

Honor an explicit ``JAX_PLATFORMS`` env request at the config level too:
some deployment images install a sitecustomize that registers a TPU PJRT
plugin and forces backend resolution toward it regardless of the env var
(the plugin hook intercepts ``get_backend``).  Mirroring the env var into
``jax.config`` restores the documented semantics — ``JAX_PLATFORMS=cpu
python -m prima_tpu.tools.cli ...`` must never touch (or block on) the
TPU plugin.  No-op when the var is unset or jax isn't importable yet.
"""

import os as _os

_plat = _os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        import jax as _jax

        if _jax.config.jax_platforms != _plat:
            _jax.config.update("jax_platforms", _plat)
    except Exception:  # pragma: no cover - jax absent or too old
        pass
del _os, _plat
