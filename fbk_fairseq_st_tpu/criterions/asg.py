"""ASG criterion (reference criterions/ASG_loss.py:14 — there it needs the
external wav2letter bindings; here the loss is native, ops/asg.py).

The learned (V, V) transition matrix lives in the MODEL's param tree as
``asg_transitions`` (the same convention that moved the CTC head into the
encoder — conv_transformer raw_state_dict_upgrade), so the standard trainer
optimizes it with everything else.

Replabel packing, eos→silence replacement and LinSeg initialization are
data-dependent host-side work, done in ``prepare_sample`` (the trainer
calls it before staging the batch); the jit-traced ``__call__`` consumes
the packed arrays.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..data.replabels import pack_replabels
from ..ops.asg import asg_loss
from ..registry import register_criterion
from .base import Criterion


@register_criterion("asg_loss")
class ASGCriterion(Criterion):
    @classmethod
    def add_args(cls, parser):
        group = parser.add_argument_group("ASG Loss")
        group.add_argument("--asg-transitions-init", type=float, default=0.0,
                           help="initial diagonal value of the transition "
                           "matrix")
        group.add_argument("--max-replabel", type=int, default=2,
                           help="maximum # of replabels")
        group.add_argument("--linseg-updates", type=int, default=0,
                           help="# of training updates using LinSeg "
                           "initialization")
        group.add_argument("--hide-linseg-messages", action="store_true")
        # --silence-token comes from the speech_recognition task args
        # (reference tasks/speech_recognition.py --silence-token)
        group.add_argument("--asg-scale-mode", default="target_sz_sqrt",
                           choices=["none", "input_sz", "input_sz_sqrt",
                                    "target_sz", "target_sz_sqrt"],
                           help="loss scaling (wav2letter "
                           "CriterionScaleMode; reference uses "
                           "TARGET_SZ_SQRT)")

    def __init__(self, task, args):
        super().__init__(task, args)
        self.tgt_dict = task.target_dictionary
        self.eos = self.tgt_dict.eos()
        silence_token = getattr(args, "silence_token", "|")
        self.silence = (
            self.tgt_dict.index(silence_token)
            if silence_token in self.tgt_dict.indices
            else None
        )
        self.max_replabel = getattr(args, "max_replabel", 2)
        self.linseg_updates = getattr(args, "linseg_updates", 0)
        self.scale_mode = getattr(args, "asg_scale_mode", "target_sz_sqrt")
        self._linseg_announced = getattr(args, "hide_linseg_messages", False)

    # -- host-side packing --------------------------------------------------

    def _replace_eos_with_silence(self, tgt):
        if not tgt or tgt[-1] != self.eos:
            return tgt
        if self.silence is None or (len(tgt) > 1 and tgt[-2] == self.silence):
            return tgt[:-1]
        return tgt[:-1] + [self.silence]

    def prepare_sample(self, sample, num_updates: int, training: bool = True):
        if not sample or "net_input" not in sample:
            return sample
        target = np.asarray(sample["target"])
        lengths = np.asarray(
            sample.get(
                "target_lengths",
                (target != self.padding_idx).sum(axis=1),
            )
        )
        src_lengths = np.asarray(sample["net_input"]["src_lengths"])
        B = target.shape[0]
        # reference linseg_step() returns False when not self.training —
        # validation targets must never be LinSeg-stretched or val losses in
        # the warmup window aren't comparable to post-warmup ones
        use_linseg = training and num_updates < self.linseg_updates
        if use_linseg and not self._linseg_announced:
            print("| using LinSeg to initialize ASG")
            self._linseg_announced = True

        packed = []
        for b in range(B):
            n = int(lengths[b])
            if n == 0:
                # bucketed batches pad to a batch-size bucket with all-pad
                # dummy rows; they carry a placeholder target and are
                # masked out of the loss via asg_target_lengths == 0
                packed.append([0])
                continue
            tgt = target[b, :n].tolist()
            tgt = self._replace_eos_with_silence(tgt)
            tgt = pack_replabels(tgt, self.tgt_dict, self.max_replabel)
            T_b = int(src_lengths[b])
            tgt = tgt[:T_b]
            if use_linseg:
                # linear segmentation: stretch the target uniformly over
                # the frames (reference ASG_loss.py:137)
                tgt = [tgt[t * len(tgt) // T_b] for t in range(T_b)]
            packed.append(tgt)
        L = max(len(t) for t in packed)
        asg_target = np.zeros((B, L), np.int32)
        asg_lengths = np.zeros((B,), np.int32)
        for b, t in enumerate(packed):
            asg_target[b, : len(t)] = t
            asg_lengths[b] = len(t) if int(lengths[b]) > 0 else 0
        out = dict(sample)
        out["asg_target"] = asg_target
        out["asg_target_lengths"] = asg_lengths
        # keep the sample's true token count (pre-packing): the trainer
        # normalizes gradients by sample_size, and the reference uses
        # sample['ntokens'], not the packed length sum
        # 0-d scalar: batch sharding only applies to rank>=1 arrays
        out["asg_ntokens"] = np.asarray(
            sample.get("ntokens", int(lengths.sum())), np.int64
        )
        return out

    # -- traced loss ----------------------------------------------------------

    def __call__(self, model, variables, batch, rng=None, training=False):
        (logits, _), new_state = model.forward(
            variables,
            {k: v for k, v in batch.items()
             if k not in ("asg_target", "asg_target_lengths", "asg_ntokens",
                          "target", "target_lengths")},
            rng=rng, training=training,
        )
        transitions = variables["params"].get("asg_transitions")
        if transitions is None:
            transitions = jnp.zeros(
                (logits.shape[-1], logits.shape[-1]), jnp.float32
            )
        tgt_lengths = batch["asg_target_lengths"]
        losses = asg_loss(
            logits,
            transitions,
            batch["asg_target"],
            batch["src_lengths"],
            jnp.maximum(tgt_lengths, 1),
            scale_mode=self.scale_mode,
        )
        valid = (tgt_lengths > 0).astype(losses.dtype)
        loss = jnp.sum(losses * valid)
        ntokens = (
            batch["asg_ntokens"]
            if "asg_ntokens" in batch
            else jnp.sum(tgt_lengths)
        )
        nsentences = jnp.sum(valid)
        sample_size = (
            nsentences.astype(jnp.float32)
            if self.sentence_avg
            else ntokens.astype(jnp.float32)
        )
        logging_output = {
            "loss": loss,
            "ntokens": ntokens,
            "nsentences": nsentences,
            "sample_size": sample_size,
        }
        return loss, sample_size, logging_output, new_state
