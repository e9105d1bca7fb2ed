"""translation_lev: translation with target noising for NAT training.

Counterpart of fairseq/tasks/translation_lev.py: the decoder input is a
noised copy of the target (--noise random_delete / random_mask / full_mask /
no_noise), built on device inside the jitted step (reference does it
host-side in train_step).
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
        elif noise == "random_delete":
            prev = self._random_delete(batch["target"], rng)
        else:
            raise NotImplementedError(f"unknown noise {noise}")
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

    def _random_delete(self, target, rng):
        """Keep a uniform-random prefix of the score-sorted tokens, bos/eos
        always kept, then compact left at fixed width (reference
        translation_lev.py _random_delete; the levenshtein model's training
        input)."""
        d = self.target_dictionary
        b, t = target.shape
        pad_mask = target == d.pad()
        special = (target == d.bos()) | (target == d.eos())
        scores = jax.random.uniform(rng.next(), (b, t))
        scores = jnp.where(special, 0.0, scores)  # always kept
        scores = jnp.where(pad_mask, 1.0, scores)  # never kept
        length = jnp.sum(~pad_mask, axis=1)
        cutoff = 2 + (
            jax.random.uniform(rng.next(), (b,))
            * (length - 2).astype(jnp.float32)
        ).astype(jnp.int32)
        ranks = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
        keep = ranks < cutoff[:, None]
        # order-preserving compaction of the kept tokens
        ar = jnp.arange(t)[None, :]
        order = jnp.argsort(jnp.where(keep, ar, t + ar), axis=1)
        out = jnp.take_along_axis(target, order, axis=1)
        n_keep = jnp.sum(keep, axis=1, keepdims=True)
        return jnp.where(ar < n_keep, out, d.pad()).astype(target.dtype)

    def build_generator(self, models, args):
        from ..generation.iterative_refinement_generator import (
            IterativeRefinementGenerator,
        )

        return IterativeRefinementGenerator(
            self.target_dictionary,
            max_iter=getattr(args, "iter_decode_max_iter", 10),
            max_len_a=getattr(args, "max_len_a", 0),
            max_len_b=getattr(args, "max_len_b", 200),
            beam_size=getattr(args, "iter_decode_with_beam", 1),
            reranking=getattr(args, "iter_decode_with_external_reranker", False),
            retain_history=getattr(args, "retain_iter_history", False),
            decoding_format=getattr(args, "decoding_format", None),
        )
