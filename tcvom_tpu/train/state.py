"""Train state pytree: params + mutable model state + optimizer state."""
from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    model_state: Any     # {'batch_stats': ..., 'spectral': ...}
    opt_state: Any

    @property
    def variables(self):
        return {"params": self.params, **self.model_state}
