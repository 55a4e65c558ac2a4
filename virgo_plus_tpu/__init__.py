"""virgo_plus_tpu: TPU-native Virgo++ zero-knowledge proof framework.

Field elements ride in uint64 lanes (XLA legalizes to u32 pairs on TPU), so
64-bit types must be enabled before any array is created.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)
