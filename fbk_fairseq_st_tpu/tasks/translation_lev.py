"""translation_lev: translation with target noising for NAT training.

Counterpart of fairseq/tasks/translation_lev.py: the decoder input is a
noised copy of the target (--noise random_mask / full_mask / no_noise),
built on device inside the jitted step (reference does it host-side in
train_step). random_delete (used by the levenshtein model) is queued with
that model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..registry import register_task
from .translation import TranslationTask


@register_task("translation_lev")
class TranslationLevenshteinTask(TranslationTask):
    @staticmethod
    def add_args(parser):
        TranslationTask.add_args(parser)
        parser.add_argument(
            "--noise", default="random_mask",
            choices=["random_delete", "random_mask", "no_noise", "full_mask"],
        )

    def augment_batch(self, batch, rng):
        if "target" not in batch:
            return batch
        noise = getattr(self.args, "noise", "random_mask")
        if noise == "no_noise":
            prev = batch["target"]
        elif noise in ("random_mask", "full_mask"):
            prev = self._masked_prev(batch["target"], rng, full=noise == "full_mask")
        else:
            raise NotImplementedError(
                "random_delete noise ships with the levenshtein model "
                "(round-2 queue); use --noise random_mask/full_mask"
            )
        batch = dict(batch)
        batch["prev_output_tokens"] = prev
        return batch

    def _masked_prev(self, target, rng, full: bool):
        d = self.target_dictionary
        special = (
            (target == d.pad()) | (target == d.bos()) | (target == d.eos())
        )
        if full:
            return jnp.where(special, target, d.unk()).astype(target.dtype)
        # mask a uniform fraction of the maskable positions (reference
        # _random_mask: per-sentence uniform ratio)
        b, t = target.shape
        ratio = jax.random.uniform(rng.next(), (b, 1))
        scores = jax.random.uniform(rng.next(), (b, t))
        scores = jnp.where(special, 2.0, scores)  # specials never masked
        maskable = jnp.sum(~special, axis=1, keepdims=True)
        k = jnp.ceil(ratio * maskable)  # at least... reference: +1 floor
        ranks = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
        mask = ranks < k
        return jnp.where(mask, d.unk(), target).astype(target.dtype)

    def build_generator(self, models, args):
        from ..generation.iterative_refinement_generator import (
            IterativeRefinementGenerator,
        )

        return IterativeRefinementGenerator(
            self.target_dictionary,
            max_iter=getattr(args, "iter_decode_max_iter", 10),
            max_len_a=getattr(args, "max_len_a", 0),
            max_len_b=getattr(args, "max_len_b", 200),
        )
