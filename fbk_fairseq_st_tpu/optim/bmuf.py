"""BMUF: Block-wise Model Update Filtering (Chen & Huo, 2016).

Counterpart of fairseq/optim/bmuf.py:16-229. The reference's mechanics are
worker-local parameters all-reduced every --global-sync-iter updates with a
block-momentum filter. Under GSPMD data parallelism the per-step gradient
all-reduce is part of the compiled program, so the "average over workers"
is the identity — what remains, and what this module implements, is the
block update filter itself:

    every sync_iter updates (after warmup):
        g_t       = params_prev_block - params_now        (block "gradient")
        s_t       = block_momentum * s_{t-1} + block_lr * g_t
        params    = params_prev_block - s_t
        if use_nbm (Nesterov block momentum):
            params -= block_momentum * s_t
        params_prev_block = params_prev_block - s_t

The local-SGD communication saving (suppressing the per-step all-reduce) is
an orthogonal scheduling choice on TPU — run the train step per-replica via
shard_map with unsynced grads and call `block_step` at the sync points.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def add_bmuf_args(parser):
    """Reference bmuf.py:38-75."""
    parser.add_argument("--block-lr", default=1.0, type=float,
                        help="block learning rate for bmuf")
    parser.add_argument("--block-momentum", default=0.875, type=float,
                        help="block momentum for bmuf")
    parser.add_argument("--global-sync-iter", default=50, type=int,
                        help="iterations between global model syncs")
    parser.add_argument("--warmup-iterations", default=500, type=int,
                        help="warmup iterations before block updates start")
    parser.add_argument("--use-nbm", action="store_true", default=False,
                        help="use Nesterov-style block momentum")
    parser.add_argument("--average-sync", action="store_true", default=False,
                        help="average optimizer state at sync points")


class BMUF:
    def __init__(self, args):
        self.block_lr = getattr(args, "block_lr", 1.0)
        self.block_momentum = getattr(args, "block_momentum", 0.875)
        self.sync_iter = getattr(args, "global_sync_iter", 50)
        self.warmup_iteration = getattr(args, "warmup_iterations", 500)
        self.use_nbm = getattr(args, "use_nbm", False)
        self.global_params: Optional[Any] = None
        self.smoothed_grads: Optional[Any] = None

        def _block(params, global_params, smoothed):
            g = jax.tree_util.tree_map(jnp.subtract, global_params, params)
            smoothed = jax.tree_util.tree_map(
                lambda s, gi: self.block_momentum * s + self.block_lr * gi,
                smoothed, g,
            )
            new_global = jax.tree_util.tree_map(
                jnp.subtract, global_params, smoothed
            )
            if self.use_nbm:
                new_params = jax.tree_util.tree_map(
                    lambda p, s: p - self.block_momentum * s,
                    new_global, smoothed,
                )
            else:
                new_params = new_global
            return new_params, new_global, smoothed

        self._block = jax.jit(_block)

    def _reset(self, params):
        # deep-copy: the trainer's fused step donates its param buffers, so
        # state held across steps must own its memory
        self.global_params = jax.tree_util.tree_map(jnp.copy, params)
        self.smoothed_grads = jax.tree_util.tree_map(jnp.zeros_like, params)

    def step(self, params, num_updates: int):
        """Call after every optimizer update; returns possibly-filtered
        params (reference step :155-162)."""
        if num_updates == self.warmup_iteration:
            self._reset(params)  # warmup sync: adopt current model
            return params
        if (
            num_updates > self.warmup_iteration
            and num_updates % self.sync_iter == 0
            and self.block_momentum != 0
        ):
            if self.global_params is None:
                self._reset(params)
                return params
            params, new_global, self.smoothed_grads = self._block(
                params, self.global_params, self.smoothed_grads
            )
            # the returned params feed back into the (donating) train step;
            # keep an owned copy of the block-global model
            self.global_params = jax.tree_util.tree_map(jnp.copy, new_global)
        return params

    def state_dict(self):
        return {
            "global_params": self.global_params,
            "smoothed_grads": self.smoothed_grads,
        }

    def load_state_dict(self, d):
        self.global_params = d.get("global_params")
        self.smoothed_grads = d.get("smoothed_grads")
