"""Neural packet-loss simulator (opus/dnn/lossgen.c).

A tiny GRU generative model of bursty network loss: input
[last_loss, target_percent/100] -> dense(tanh) -> GRU -> GRU ->
dense(sigmoid) -> Bernoulli sample.  The first 100 samples are burned
to wash out the zero-initialised GRU state (lossgen.c:118-130).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from . import weights as wt
from .nnet import (ACTIVATION_SIGMOID, ACTIVATION_TANH,
                   compute_generic_dense, compute_generic_gru)


class LossGen:
    """LossGenState + model (lossgen.h, lossgen.c:99-146)."""

    def __init__(self, arrays: Dict[str, wt.WeightArray],
                 seed: Optional[int] = None):
        a = arrays
        d_in, d_out = wt.layer_dims(a, "lossgen_dense_in", 2)
        self.dense_in = wt.linear_init(a, "lossgen_dense_in", d_in, d_out)
        g1, _ = wt.layer_dims(a, "lossgen_gru1_recurrent")
        self.gru1_input = wt.linear_init(a, "lossgen_gru1_input",
                                         d_out, 3 * g1)
        self.gru1_recurrent = wt.linear_init(a, "lossgen_gru1_recurrent",
                                             g1, 3 * g1)
        g2, _ = wt.layer_dims(a, "lossgen_gru2_recurrent")
        self.gru2_input = wt.linear_init(a, "lossgen_gru2_input",
                                         g1, 3 * g2)
        self.gru2_recurrent = wt.linear_init(a, "lossgen_gru2_recurrent",
                                             g2, 3 * g2)
        o_in, o_out = wt.layer_dims(a, "lossgen_dense_out", g2)
        self.dense_out = wt.linear_init(a, "lossgen_dense_out", o_in, o_out)
        self.rng = np.random.default_rng(seed)
        self.reset()

    @classmethod
    def from_blob(cls, blob: bytes, seed: Optional[int] = None
                  ) -> "LossGen":
        return cls(wt.parse_weights(blob), seed=seed)

    def reset(self):
        self.gru1_state = np.zeros(self.gru1_recurrent.nb_inputs,
                                   np.float32)
        self.gru2_state = np.zeros(self.gru2_recurrent.nb_inputs,
                                   np.float32)
        self.last_loss = 0.0
        self.used = False

    def _sample(self, percent_loss: float) -> int:
        x = np.array([self.last_loss, percent_loss], np.float32)
        t = compute_generic_dense(self.dense_in, x, ACTIVATION_TANH)
        self.gru1_state = compute_generic_gru(
            self.gru1_input, self.gru1_recurrent, self.gru1_state, t)
        self.gru2_state = compute_generic_gru(
            self.gru2_input, self.gru2_recurrent, self.gru2_state,
            self.gru1_state)
        p = compute_generic_dense(self.dense_out, self.gru2_state,
                                  ACTIVATION_SIGMOID)[0]
        loss = int(self.rng.random() < p)
        self.last_loss = float(loss)
        return loss

    def sample(self, percent_loss: float) -> int:
        """sample_loss (lossgen.c:118-130): burn-in then sample."""
        if not self.used:
            for _ in range(100):
                self._sample(percent_loss)
            self.used = True
        return self._sample(percent_loss)

    def trace(self, n: int, percent_loss: float) -> np.ndarray:
        """Generate a loss pattern of length n (lossgen_demo.c)."""
        return np.array([self.sample(percent_loss) for _ in range(n)],
                        np.int32)
