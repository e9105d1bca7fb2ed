"""translation_moe task: mixture-of-experts translation (Shen et al. 2019,
"Mixture Models for Diverse Machine Translation: Tricks of the Trade").

Counterpart of examples/translation_moe/src/translation_moe.py:16-219 +
logsumexp_moe.py + mean_pool_gating_network.py:

  * K expert indicator tokens ``<expert_i>`` appended to both dictionaries;
    expert identity enters the decoder as the BOS token;
  * methods: sMoElp / sMoEup (soft mixture, learned / uniform prior) and
    hMoElp / hMoEup (hard EM winner selection);
  * E-step responsibilities computed dropout-free under stop_gradient, then
    the M-step loss with dropout: hard -> winner's NLL, soft -> LogSumExp
    with the E-step posterior as the (custom) backward — LogSumExpMoE as a
    jax.custom_vjp;
  * optional mean-pool gating network over the encoder states for the
    learned prior;
  * generation picks an expert via --gen-expert (BOS token override).

TPU design: the reference overrides task.train_step; here the same math
lives in a criterion wrapper so it runs inside the one jitted train step.
The K expert forwards are a static Python loop (K is a compile-time
constant). The per-step 'posterior' vector is not emitted in the scalar
logging stream (host metrics are scalar-valued); responsibilities remain
available to callers via the criterion's aux output.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.core import RngStream, dropout, init_linear, linear
from ..registry import CRITERIONS, register_task
from .translation import TranslationTask


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def logsumexp_moe(logp, posterior, axis=-1):
    """LogSumExp forward; the E-step posterior as the backward
    (reference logsumexp_moe.py:9-26)."""
    return jax.scipy.special.logsumexp(logp, axis=axis)


def _lse_fwd(logp, posterior, axis):
    return logsumexp_moe(logp, posterior, axis), posterior


def _lse_bwd(axis, posterior, g):
    return jnp.expand_dims(g, axis) * posterior, jnp.zeros_like(posterior)


logsumexp_moe.defvjp(_lse_fwd, _lse_bwd)


def init_gating_network(key, embed_dim: int, num_experts: int):
    k1, k2 = jax.random.split(key)
    return {
        "fc1": init_linear(k1, embed_dim, embed_dim),
        "fc2": init_linear(k2, embed_dim, num_experts),
    }


def mean_pool_gating(params, encoder_out, encoder_padding_mask, dropout_p,
                     rng=None, deterministic=True):
    """(B, T, C) -> (B, K) log-prior (reference
    mean_pool_gating_network.py:10-50)."""
    x = encoder_out
    if encoder_padding_mask is not None:
        keep = (~encoder_padding_mask)[:, :, None].astype(x.dtype)
        denom = jnp.maximum(jnp.sum(keep, axis=1), 1.0)
        x = jnp.sum(x * keep, axis=1) / denom
    else:
        x = jnp.mean(x, axis=1)
    x = jnp.tanh(linear(params["fc1"], x))
    x = dropout(x, dropout_p, rng or RngStream(None), deterministic)
    x = linear(params["fc2"], x)
    return jax.nn.log_softmax(x.astype(jnp.float32), axis=-1).astype(x.dtype)


class _MoEModel:
    """Delegating wrapper that owns the gating-network params."""

    def __init__(self, model, num_experts: int, gating_dim, gating_dropout):
        self._model = model
        self.num_experts = num_experts
        self.gating_dim = gating_dim
        self.gating_dropout = gating_dropout

    def __getattr__(self, name):
        return getattr(self._model, name)

    def init(self, key):
        variables = self._model.init(key)
        if self.gating_dim is not None:
            variables["params"]["gating_network"] = init_gating_network(
                jax.random.fold_in(key, 4242), self.gating_dim,
                self.num_experts,
            )
        return variables

    def gating(self, variables, encoder_out, rng=None, deterministic=True):
        return mean_pool_gating(
            variables["params"]["gating_network"],
            encoder_out.encoder_out,
            encoder_out.encoder_padding_mask,
            self.gating_dropout,
            rng=rng,
            deterministic=deterministic,
        )


class _MoECriterion:
    """EM mixture loss around an inner criterion (reference _get_loss
    :121-185)."""

    def __init__(self, inner, task):
        self.inner = inner
        self.task = task
        self.padding_idx = task.target_dictionary.pad()
        self.sentence_avg = getattr(task.args, "sentence_avg", False)
        self.eps = getattr(inner, "eps", 0.0)

    def _lprob_y(self, model, variables, batch, prev_k, encoder_out, rng,
                 deterministic):
        """Per-sentence log p(y | x, z=k): the (label-smoothed) negative
        loss, unreduced over the batch."""
        logits, _ = model.decoder(
            variables["params"]["decoder"],
            prev_k,
            encoder_out=encoder_out.encoder_out,
            encoder_padding_mask=encoder_out.encoder_padding_mask,
            rng=rng,
            deterministic=deterministic,
        )
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        target = batch["target"]
        nll = -jnp.take_along_axis(lprobs, target[..., None], axis=-1)[..., 0]
        smooth = -jnp.sum(lprobs, axis=-1)
        keep = (target != self.padding_idx).astype(lprobs.dtype)
        eps_i = self.eps / lprobs.shape[-1]
        loss = ((1.0 - self.eps) * nll + eps_i * smooth) * keep
        return -jnp.sum(loss, axis=1)  # (B,)

    def _lprob_yz(self, model, variables, batch, encoder_out, rng,
                  deterministic, winners=None):
        task = self.task
        prev = jnp.asarray(batch["prev_output_tokens"])
        if winners is None:
            cols = []
            for i in range(task.num_experts):
                prev_k = prev.at[:, 0].set(task.expert_index(i))
                cols.append(
                    self._lprob_y(
                        model, variables, batch, prev_k, encoder_out, rng,
                        deterministic,
                    )
                )
            lprob_y = jnp.stack(cols, axis=1)  # (B, K)
        else:
            prev_k = prev.at[:, 0].set(
                task.expert_index(0) + winners.astype(prev.dtype)
            )
            lprob_y = self._lprob_y(
                model, variables, batch, prev_k, encoder_out, rng,
                deterministic,
            )  # (B,)
        if task.uniform_prior:
            return lprob_y
        lprob_z = model.gating(
            variables, encoder_out, rng=rng, deterministic=deterministic
        )
        if winners is not None:
            lprob_z = jnp.take_along_axis(
                lprob_z, winners[:, None], axis=1
            )[:, 0]
        return lprob_y + lprob_z.astype(lprob_y.dtype)

    def __call__(self, model, variables, batch, rng=None, training=False):
        task = self.task
        rng = rng or RngStream(None)
        enc, new_state = model.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng,
            training,
        )

        # E-step: responsibilities without dropout, no gradient
        lprob_yz_eval = self._lprob_yz(
            model, variables, batch, enc, RngStream(None), True
        )
        posterior = jax.lax.stop_gradient(
            jax.nn.softmax(lprob_yz_eval.astype(jnp.float32), axis=1)
        )

        # M-step: loss with dropout
        if task.hard_selection:
            winners = jnp.argmax(posterior, axis=1)
            loss = -self._lprob_yz(
                model, variables, batch, enc, rng, not training,
                winners=winners,
            )
        else:
            lprob_yz = self._lprob_yz(
                model, variables, batch, enc, rng, not training
            )
            loss = -logsumexp_moe(lprob_yz, posterior, 1)
        loss = jnp.sum(loss)

        ntokens = jnp.sum(batch["target"] != self.padding_idx)
        nsentences = batch["target"].shape[0]
        sample_size = (
            jnp.asarray(nsentences) if self.sentence_avg else ntokens
        )
        logging_output = {
            "loss": loss,
            "ntokens": ntokens,
            "nsentences": jnp.asarray(nsentences),
            "sample_size": sample_size,
        }
        return loss, sample_size, logging_output, new_state

    def reduce_metrics(self, logging_outputs, metrics):
        import math

        loss_sum = sum(log.get("loss", 0) for log in logging_outputs)
        sample_size = sum(log.get("sample_size", 0) for log in logging_outputs)
        metrics.log_scalar(
            "loss", loss_sum / sample_size / math.log(2), sample_size, round=3
        )


@register_task("translation_moe")
class TranslationMoETask(TranslationTask):
    @staticmethod
    def add_args(parser):
        TranslationTask.add_args(parser)
        parser.add_argument("--method", default="hMoEup",
                            choices=["sMoElp", "sMoEup", "hMoElp", "hMoEup"])
        parser.add_argument("--num-experts", default=3, type=int, metavar="N",
                            help="number of experts")
        parser.add_argument("--mean-pool-gating-network", action="store_true",
                            help="use a simple mean-pooling gating network")
        parser.add_argument("--mean-pool-gating-network-dropout", type=float)
        parser.add_argument("--mean-pool-gating-network-encoder-dim",
                            type=float)
        parser.add_argument("--gen-expert", type=int, default=0,
                            help="which expert to use for generation")

    def __init__(self, args, src_dict, tgt_dict):
        method = args.method
        self.uniform_prior = method in ("sMoEup", "hMoEup")
        self.hard_selection = method in ("hMoElp", "hMoEup")
        self.num_experts = args.num_experts
        for i in range(args.num_experts):
            src_dict.add_symbol(f"<expert_{i}>")
            tgt_dict.add_symbol(f"<expert_{i}>")
        super().__init__(args, src_dict, tgt_dict)

    def expert_index(self, i):
        return i + self.tgt_dict.index("<expert_0>")

    def build_model(self, args):
        model = super().build_model(args)
        if self.uniform_prior:
            return model
        if not getattr(self.args, "mean_pool_gating_network", False):
            raise ValueError(
                "translation_moe task with learned prior requires the model "
                "to have a gating network; try using "
                "--mean-pool-gating-network"
            )
        encoder_dim = (
            getattr(args, "mean_pool_gating_network_encoder_dim", None)
            or getattr(args, "encoder_embed_dim", None)
        )
        if not encoder_dim:
            raise ValueError(
                "Must specify --mean-pool-gating-network-encoder-dim"
            )
        gating_dropout = (
            getattr(args, "mean_pool_gating_network_dropout", None)
            or getattr(args, "dropout", None)
        )
        if gating_dropout is None:
            raise ValueError("Must specify --mean-pool-gating-network-dropout")
        return _MoEModel(
            model, self.num_experts, int(encoder_dim), gating_dropout
        )

    def build_criterion(self, args):
        inner = CRITERIONS[args.criterion].build_criterion(args, self)
        return _MoECriterion(inner, self)

    def inference_step(self, generator, models, sample, prefix_tokens=None,
                       expert=None):
        expert = expert if expert is not None else getattr(
            self.args, "gen_expert", 0
        )
        return generator.generate(
            models, sample, prefix_tokens=prefix_tokens,
            bos_token=self.expert_index(expert),
        )
