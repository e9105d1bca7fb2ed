"""wav2vec: unsupervised speech representation pretraining (Schneider et
al. 2019) with optional vq-wav2vec quantization.

Counterpart of fairseq/models/wav2vec.py:26-744. TPU redesign notes:
convolutions run NWC through lax.conv_general_dilated; the reference's
ConvTranspose2d(1, steps) step-projection head (:570-572) is an einsum over
a (C, steps, embed) weight; the flattened variable-length CPC prediction
buffer (:650-680) becomes a dense (steps, copies, B, T) logits tensor with
a validity mask so the whole contrastive loss is one fixed-shape program.
Feature/aggregator stacks, group-norm(1), log compression, skip connections
with residual scaling, within- and cross-utterance negative sampling, and
the gumbel / kmeans vector quantizers are preserved.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.core import RngStream, dropout, get_activation, init_linear, linear, normal_init
from ..registry import register_model, register_model_architecture
from .base import Model


def _conv1d(w, x, stride: int, bias=None):
    """x: (B, T, Cin), w: (K, Cin, Cout) -> (B, T', Cout)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        out = out + bias
    return out


def group_norm1(p, x, eps: float = 1e-5):
    """GroupNorm with one group over (T, C) per sample in fp32 (reference
    Fp32GroupNorm(1, dim))."""
    x32 = x.astype(jnp.float32)
    mean = x32.mean(axis=(1, 2), keepdims=True)
    var = x32.var(axis=(1, 2), keepdims=True)
    out = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if p:
        out = out * p["scale"].astype(jnp.float32) + p["bias"].astype(
            jnp.float32
        )
    return out.astype(x.dtype)


class Wav2VecConfig(NamedTuple):
    prediction_steps: int = 12
    sample_distance: Optional[int] = None
    cross_sample_negatives: int = 0
    num_negatives: int = 10
    conv_feature_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5), (512, 8, 4), (512, 4, 2), (512, 4, 2), (512, 4, 2),
        (512, 1, 1), (512, 1, 1),
    )
    conv_aggregator_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 3, 1),) * 9
    dropout: float = 0.0
    dropout_features: float = 0.0
    dropout_agg: float = 0.0
    aggregator: str = "cnn"
    gru_dim: int = 512
    no_conv_bias: bool = False
    agg_zero_pad: bool = False
    skip_connections_feat: bool = False
    skip_connections_agg: bool = True
    residual_scale: float = 0.5
    log_compression: bool = True
    balanced_classes: bool = False
    infonce: bool = False
    project_features: str = "none"  # none|same|new
    non_affine_group_norm: bool = False
    offset: int = 1  # resolved from "auto" at build time
    activation: str = "relu"
    vq_type: str = "none"  # none|gumbel|kmeans
    vq_vars: int = 320
    vq_groups: int = 2
    vq_dim: int = 0
    vq_depth: int = 1
    combine_groups: bool = False
    vq_temp: Tuple[float, float, float] = (2.0, 0.5, 0.999995)
    vq_gamma: float = 0.25


def _auto_offset(layers) -> int:
    """Receptive-field offset (reference wav2vec.py:275-288)."""
    jin, rin = 0, 0
    for _, k, stride in layers:
        if rin == 0:
            rin = k
        rin = rin + (k - 1) * jin
        jin = stride if jin == 0 else jin * stride
    return int(math.ceil(rin / jin))


@register_model("wav2vec")
class Wav2VecModel(Model):
    def __init__(self, cfg: Wav2VecConfig):
        self.cfg = cfg
        self.embed = cfg.conv_feature_layers[-1][0]
        self.agg_dim = (
            cfg.gru_dim if cfg.aggregator == "gru"
            else cfg.conv_aggregator_layers[-1][0]
        )
        self.max_source_positions = 10 ** 9
        self.max_target_positions = 10 ** 9

    @staticmethod
    def add_args(parser):
        # reference wav2vec.py:28-206 (subset: cnn encoder/aggregator)
        parser.add_argument("--prediction-steps", type=int, metavar="N")
        parser.add_argument("--sample-distance", type=int, metavar="N")
        parser.add_argument("--cross-sample-negatives", type=int, metavar="N")
        parser.add_argument("--num-negatives", type=int, metavar="N")
        parser.add_argument("--conv-feature-layers", type=str, metavar="EXPR")
        parser.add_argument("--conv-aggregator-layers", type=str, metavar="EXPR")
        parser.add_argument("--dropout", type=float, metavar="D")
        parser.add_argument("--dropout-features", type=float, metavar="D")
        parser.add_argument("--dropout-agg", type=float, metavar="D")
        parser.add_argument("--encoder", type=str, choices=["cnn"])
        parser.add_argument("--aggregator", type=str,
                            choices=["cnn", "gru"])
        # reference wav2vec.py:91-93 (one-layer unidirectional GRU over the
        # encoder features instead of the causal conv stack)
        parser.add_argument("--gru-dim", type=int, metavar="N",
                            help="GRU dimensionality")
        parser.add_argument("--no-conv-bias", action="store_true")
        parser.add_argument("--agg-zero-pad", action="store_true")
        parser.add_argument("--skip-connections-feat", action="store_true")
        parser.add_argument("--skip-connections-agg", action="store_true")
        parser.add_argument("--residual-scale", type=float, metavar="D")
        parser.add_argument("--log-compression", action="store_true")
        parser.add_argument("--balanced-classes", action="store_true")
        parser.add_argument("--infonce", action="store_true")
        parser.add_argument("--project-features",
                            choices=["none", "same", "new"])
        parser.add_argument("--non-affine-group-norm", action="store_true")
        parser.add_argument("--offset", type=str, metavar="N")
        parser.add_argument("--activation", type=str,
                            choices=["relu", "gelu"])
        parser.add_argument("--vq-type", type=str,
                            choices=["none", "gumbel", "kmeans"])
        parser.add_argument("--vq-vars", type=int, metavar="N")
        parser.add_argument("--vq-groups", type=int, metavar="N")
        parser.add_argument("--vq-dim", type=int, metavar="N")
        parser.add_argument("--vq-depth", type=int, metavar="N")
        parser.add_argument("--combine-groups", action="store_true")
        parser.add_argument("--vq-temp", type=str, metavar="TEMP")
        parser.add_argument("--vq-gamma", type=float, metavar="D")

    @classmethod
    def build_model(cls, args, task):
        base_wav2vec_architecture(args)
        feat = tuple(eval(args.conv_feature_layers))  # noqa: S307 (same
        # bracketed-EXPR convention as the reference, wav2vec.py:233)
        agg = tuple(eval(args.conv_aggregator_layers))  # noqa: S307
        offset = args.offset
        if offset == "auto":
            offset = _auto_offset(feat)
        cfg = Wav2VecConfig(
            prediction_steps=args.prediction_steps,
            sample_distance=args.sample_distance,
            cross_sample_negatives=args.cross_sample_negatives,
            num_negatives=args.num_negatives,
            conv_feature_layers=feat,
            conv_aggregator_layers=agg,
            dropout=args.dropout,
            dropout_features=args.dropout_features,
            dropout_agg=args.dropout_agg,
            aggregator=args.aggregator,
            gru_dim=args.gru_dim,
            no_conv_bias=args.no_conv_bias,
            agg_zero_pad=args.agg_zero_pad,
            skip_connections_feat=args.skip_connections_feat,
            skip_connections_agg=args.skip_connections_agg,
            residual_scale=args.residual_scale,
            log_compression=args.log_compression,
            balanced_classes=args.balanced_classes,
            infonce=args.infonce,
            project_features=args.project_features,
            non_affine_group_norm=args.non_affine_group_norm,
            offset=int(offset),
            activation=args.activation,
            vq_type=args.vq_type,
            vq_vars=args.vq_vars,
            vq_groups=args.vq_groups,
            vq_dim=args.vq_dim,
            vq_depth=args.vq_depth,
            combine_groups=args.combine_groups,
            vq_temp=tuple(eval(args.vq_temp)),  # noqa: S307
            vq_gamma=args.vq_gamma,
        )
        return cls(cfg)

    # -- init ---------------------------------------------------------------

    def _init_feature_extractor(self, key):
        cfg = self.cfg
        layers = []
        in_d = 1
        for i, (dim, k, _) in enumerate(cfg.conv_feature_layers):
            kk = jax.random.fold_in(key, i)
            p = {
                "w": normal_init(kk, (k, in_d, dim), std=(k * in_d) ** -0.5)
            }
            if not cfg.non_affine_group_norm:
                p["norm"] = {"scale": jnp.ones(dim), "bias": jnp.zeros(dim)}
            layers.append(p)
            in_d = dim
        return layers

    def _init_aggregator(self, key):
        cfg = self.cfg
        if cfg.aggregator == "gru":
            # reference wav2vec.py:307-318: TransposeLast + nn.GRU(embed ->
            # gru_dim, 1 layer); here the shared scan cell
            from .gru_transformer import init_gru

            return {"gru": init_gru(key, self.embed, cfg.gru_dim)}
        layers = []
        in_d = self.embed
        for i, (dim, k, _) in enumerate(cfg.conv_aggregator_layers):
            kk = jax.random.fold_in(key, i)
            p = {
                "w": normal_init(kk, (k, in_d, dim), std=(k * in_d) ** -0.5)
            }
            if not cfg.no_conv_bias:
                p["b"] = jnp.zeros(dim)
            if not cfg.non_affine_group_norm:
                p["norm"] = {"scale": jnp.ones(dim), "bias": jnp.zeros(dim)}
            if cfg.skip_connections_agg and in_d != dim:
                p["rproj"] = normal_init(
                    jax.random.fold_in(kk, 99), (1, in_d, dim),
                    std=in_d ** -0.5,
                )
            layers.append(p)
            in_d = dim
        return layers

    def _init_vq(self, key):
        cfg = self.cfg
        vq_dim = cfg.vq_dim if cfg.vq_dim > 0 else self.embed
        groups = cfg.vq_groups
        n_groups = 1 if cfg.combine_groups else groups
        var_dim = vq_dim // groups
        p: Dict[str, Any] = {
            "vars": normal_init(
                jax.random.fold_in(key, 0),
                (n_groups, cfg.vq_vars, var_dim), std=0.01,
            )
        }
        if cfg.vq_type == "gumbel":
            ks = jax.random.split(jax.random.fold_in(key, 1), cfg.vq_depth)
            dims = [self.embed] + [self.embed * 2] * (cfg.vq_depth - 1)
            p["weight_proj"] = [
                init_linear(
                    ks[i], dims[i],
                    groups * cfg.vq_vars if i == cfg.vq_depth - 1
                    else self.embed * 2,
                )
                for i in range(cfg.vq_depth)
            ]
        return p

    def init(self, key):
        cfg = self.cfg
        ks = jax.random.split(key, 6)
        p: Dict[str, Any] = {
            "feature_extractor": self._init_feature_extractor(ks[0]),
            "aggregator": self._init_aggregator(ks[1]),
            # ConvTranspose2d(agg, embed, (1, steps)) == per-step linear
            "project_to_steps": {
                "w": normal_init(
                    ks[2], (self.agg_dim, cfg.prediction_steps, self.embed),
                    std=self.agg_dim ** -0.5,
                ),
                "b": jnp.zeros((cfg.prediction_steps, self.embed)),
            },
        }
        if cfg.vq_type != "none":
            p["vector_quantizer"] = self._init_vq(ks[3])
        if cfg.project_features == "new":
            p["project_features"] = self._init_aggregator(ks[4])
        return {"params": p, "state": {}}

    # -- forward pieces -------------------------------------------------------

    def feature_extractor(self, layers, x, rng, deterministic):
        """x: (B, T_samples) raw audio -> (B, T_feat, embed)."""
        cfg = self.cfg
        act = get_activation(cfg.activation)
        x = x[:, :, None]  # (B, T, 1)
        for p, (dim, k, stride) in zip(layers, cfg.conv_feature_layers):
            residual = x
            x = _conv1d(p["w"].astype(x.dtype), x, stride)
            x = dropout(x, cfg.dropout, rng, deterministic)
            x = group_norm1(p.get("norm"), x)
            x = act(x)
            if cfg.skip_connections_feat and x.shape[2] == residual.shape[2]:
                tsz, r_tsz = x.shape[1], residual.shape[1]
                residual = residual[:, :: r_tsz // tsz][:, :tsz]
                x = (x + residual) * math.sqrt(cfg.residual_scale)
        if cfg.log_compression:
            x = jnp.log(jnp.abs(x) + 1.0)
        return x

    def aggregator(self, layers, x, rng, deterministic):
        """Causal conv stack (or --aggregator gru: one recurrent sweep);
        x: (B, T, embed) -> (B, T, agg_dim)."""
        cfg = self.cfg
        if cfg.aggregator == "gru":
            from .gru_transformer import gru_scan

            return gru_scan(layers["gru"], x)
        act = get_activation(cfg.activation)
        for p, (dim, k, stride) in zip(layers, cfg.conv_aggregator_layers):
            residual = x
            ka = k // 2
            kb = ka - 1 if k % 2 == 0 else ka
            pad = ka + kb
            if cfg.agg_zero_pad:
                xp = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
            else:  # replication pad
                xp = jnp.concatenate(
                    [jnp.repeat(x[:, :1], pad, axis=1), x], axis=1
                )
            x = _conv1d(p["w"].astype(x.dtype), xp, stride, p.get("b"))
            x = dropout(x, cfg.dropout, rng, deterministic)
            x = group_norm1(p.get("norm"), x)
            x = act(x)
            if cfg.skip_connections_agg:
                if "rproj" in p:
                    residual = _conv1d(
                        p["rproj"].astype(residual.dtype), residual, 1
                    )
                x = (x + residual) * math.sqrt(cfg.residual_scale)
        return x

    def vector_quantizer(self, p, x, rng, deterministic, num_updates=0):
        """Gumbel / kmeans VQ (reference modules Gumbel/KmeansVectorQuantizer
        in time-last layout; here time-first (B,T,C))."""
        cfg = self.cfg
        B, T, C = x.shape
        groups = cfg.vq_groups
        vq_dim = cfg.vq_dim if cfg.vq_dim > 0 else C
        var_dim = vq_dim // groups
        result: Dict[str, Any] = {"num_vars": cfg.vq_vars * groups}
        vars_ = p["vars"]
        if cfg.combine_groups:
            vars_ = jnp.broadcast_to(vars_, (groups,) + vars_.shape[1:])

        if cfg.vq_type == "gumbel":
            h = x
            act = get_activation(cfg.activation)
            for i, lp in enumerate(p["weight_proj"]):
                h = linear(lp, h)
                if i < len(p["weight_proj"]) - 1:
                    h = act(h)
            logits = h.reshape(B, T, groups, cfg.vq_vars)
            start, end, decay = cfg.vq_temp
            temp = max(start * (decay ** num_updates), end)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            avg_probs = probs.reshape(-1, groups, cfg.vq_vars).mean(0)
            result["prob_perplexity"] = jnp.sum(
                jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), -1))
            )
            if deterministic or rng is None:
                onehot = jax.nn.one_hot(
                    jnp.argmax(logits, -1), cfg.vq_vars, dtype=jnp.float32
                )
            else:
                g = -jnp.log(-jnp.log(
                    jax.random.uniform(rng.next(), logits.shape) + 1e-10
                ) + 1e-10)
                y = jax.nn.softmax(
                    (logits.astype(jnp.float32) + g) / temp, axis=-1
                )
                hard = jax.nn.one_hot(
                    jnp.argmax(y, -1), cfg.vq_vars, dtype=jnp.float32
                )
                onehot = y + jax.lax.stop_gradient(hard - y)  # ST-gumbel
            q = jnp.einsum(
                "btgv,gvd->btgd", onehot, vars_.astype(jnp.float32)
            ).reshape(B, T, vq_dim)
        else:  # kmeans
            ze = x.reshape(B, T, groups, var_dim).astype(jnp.float32)
            v = vars_.astype(jnp.float32)  # (G, V, var_dim)
            d = jnp.sum(
                (ze[:, :, :, None, :] - v[None, None]) ** 2, axis=-1
            )  # (B, T, G, V)
            idx = jnp.argmin(d, axis=-1)
            zq = jnp.take_along_axis(
                jnp.broadcast_to(v[None, None], d.shape + (var_dim,)),
                idx[..., None, None], axis=3,
            )[:, :, :, 0].reshape(B, T, vq_dim)
            # straight-through + commitment (reference KmeansVectorQuantizer)
            flat_ze = ze.reshape(B, T, vq_dim)
            q = flat_ze + jax.lax.stop_gradient(zq - flat_ze)
            latent_loss = jnp.mean(
                (jax.lax.stop_gradient(flat_ze) - zq) ** 2
            )
            commitment = jnp.mean(
                (flat_ze - jax.lax.stop_gradient(zq)) ** 2
            )
            result["kmeans_loss"] = latent_loss + cfg.vq_gamma * commitment
        result["x"] = q.astype(x.dtype)
        return result

    def sample_negatives(self, key, y):
        """y: (B, T, C) -> (N, B, T, C) negatives sampled from the same
        utterance (and optionally across the batch), never index t itself
        (reference wav2vec.py:587-637)."""
        cfg = self.cfg
        B, T, C = y.shape
        flat = y.reshape(B * T, C)
        negs = []
        if cfg.num_negatives > 0:
            high = T if cfg.sample_distance is None else min(
                T, cfg.sample_distance
            )
            idx = jax.random.randint(
                key, (B, cfg.num_negatives * T), 0, high - 1
            )
            tszs = jnp.repeat(jnp.arange(T), cfg.num_negatives)[None, :]
            idx = jnp.where(idx >= tszs, idx + 1, idx)
            idx = idx + jnp.arange(B)[:, None] * T
            negs.append(flat[idx.reshape(-1)].reshape(
                B, T, cfg.num_negatives, C
            ))
        if cfg.cross_sample_negatives > 0:
            idx = jax.random.randint(
                jax.random.fold_in(key, 1),
                (B, cfg.cross_sample_negatives * T), 0, B * T - 1,
            )
            tszs = jnp.repeat(
                jnp.arange(T), cfg.cross_sample_negatives
            )[None, :]
            idx = jnp.where(idx >= tszs, idx + 1, idx)
            negs.append(flat[idx.reshape(-1)].reshape(
                B, T, cfg.cross_sample_negatives, C
            ))
        out = jnp.concatenate(negs, axis=2)  # (B, T, N, C)
        return jnp.transpose(out, (2, 0, 1, 3))  # (N, B, T, C)

    def predictions(self, p, x, y, rng, deterministic):
        """CPC logits. x: (B, T, agg) context, y: (B, T, embed) targets.
        Returns (logits, labels, weights, valid_mask), each
        (steps, copies, B, T) [labels broadcast], dense + masked instead of
        the reference's flat packed buffer."""
        cfg = self.cfg
        w = p["project_to_steps"]["w"].astype(x.dtype)
        preds = jnp.einsum("btc,cse->btse", x, w) + p["project_to_steps"][
            "b"
        ].astype(x.dtype)
        preds = dropout(preds, cfg.dropout, rng, deterministic)

        neg_key = (
            rng.next() if (rng is not None and not deterministic)
            else jax.random.PRNGKey(0)
        )
        negatives = self.sample_negatives(neg_key, y)  # (N, B, T, C)
        targets = jnp.concatenate([y[None], negatives], axis=0)
        copies = targets.shape[0]
        B, T = x.shape[0], x.shape[1]
        steps = cfg.prediction_steps

        # logits[s, n, b, t] = <preds[b, t, s], targets[n, b, t + offset + s]>
        shifted = []
        valid = []
        for s in range(steps):
            off = s + cfg.offset
            rolled = jnp.roll(targets, -off, axis=2)
            shifted.append(rolled)
            valid.append(jnp.arange(T) < (T - off))
        shifted = jnp.stack(shifted)  # (S, copies, B, T, C)
        valid = jnp.stack(valid)  # (S, T)
        logits = jnp.einsum("btse,snbte->snbt", preds, shifted)
        valid_mask = jnp.broadcast_to(
            valid[:, None, None, :], logits.shape
        )
        if cfg.infonce:
            labels = jnp.zeros((steps, B, T), jnp.int32)  # positive = row 0
        else:
            labels = jnp.concatenate(
                [
                    jnp.ones((steps, 1, B, T), jnp.float32),
                    jnp.zeros((steps, copies - 1, B, T), jnp.float32),
                ],
                axis=1,
            )
        weights = None
        if cfg.balanced_classes and not cfg.infonce:
            weights = jnp.where(
                labels == 1, 1.0, 1.0 / max(cfg.num_negatives, 1)
            )
        return logits, labels, weights, valid_mask

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False, num_updates: int = 0):
        cfg = self.cfg
        p = variables["params"]
        rng = rng or RngStream(None)
        deterministic = not training
        source = batch["source" if "source" in batch else "src_tokens"]

        result: Dict[str, Any] = {}
        features = self.feature_extractor(
            p["feature_extractor"], source, rng, deterministic
        )
        if cfg.vq_type != "none":
            q_res = self.vector_quantizer(
                p["vector_quantizer"], features, rng, deterministic,
                num_updates,
            )
            features = q_res.pop("x")
            result.update(q_res)

        x = dropout(features, cfg.dropout_features, rng, deterministic)
        x = self.aggregator(p["aggregator"], x, rng, deterministic)
        x = dropout(x, cfg.dropout_agg, rng, deterministic)

        if cfg.project_features == "same":
            features = self.aggregator(
                p["aggregator"], features, rng, deterministic
            )
        elif cfg.project_features == "new":
            features = self.aggregator(
                p["project_features"], features, rng, deterministic
            )
        logits, labels, weights, valid = self.predictions(
            p, x, features, rng, deterministic
        )
        result["cpc_logits"] = logits
        result["cpc_targets"] = labels
        result["cpc_weights"] = weights
        result["cpc_valid"] = valid
        return (logits, result), {}

    def extract_features(self, variables, source):
        """Frozen-encoder featurization for downstream ASR (reference
        wav2vec featurizer role)."""
        p = variables["params"]
        rng = RngStream(None)
        feats = self.feature_extractor(
            p["feature_extractor"], source, rng, True
        )
        return self.aggregator(p["aggregator"], feats, rng, True)


@register_model_architecture("wav2vec", "wav2vec")
def base_wav2vec_architecture(args):
    """Reference wav2vec.py:685-744."""
    conv_feature_layers = "[(512, 10, 5)]"
    conv_feature_layers += " + [(512, 8, 4)]"
    conv_feature_layers += " + [(512, 4, 2)] * 3"
    args.conv_feature_layers = getattr(
        args, "conv_feature_layers", conv_feature_layers
    )
    args.conv_aggregator_layers = getattr(
        args, "conv_aggregator_layers", "[(512, 3, 1)] * 9"
    )
    args.prediction_steps = getattr(args, "prediction_steps", 12)
    args.num_negatives = getattr(args, "num_negatives", 1)
    args.sample_distance = getattr(args, "sample_distance", None)
    args.cross_sample_negatives = getattr(args, "cross_sample_negatives", 0)
    args.dropout = getattr(args, "dropout", 0.0)
    args.dropout_features = getattr(args, "dropout_features", 0.0)
    args.dropout_agg = getattr(args, "dropout_agg", 0.0)
    args.encoder = getattr(args, "encoder", "cnn")
    args.aggregator = getattr(args, "aggregator", "cnn")
    args.skip_connections_feat = getattr(args, "skip_connections_feat", False)
    args.skip_connections_agg = getattr(args, "skip_connections_agg", False)
    args.residual_scale = getattr(args, "residual_scale", 0.5)
    args.gru_dim = getattr(args, "gru_dim", 512)
    args.no_conv_bias = getattr(args, "no_conv_bias", False)
    args.agg_zero_pad = getattr(args, "agg_zero_pad", False)
    args.log_compression = getattr(args, "log_compression", False)
    args.balanced_classes = getattr(args, "balanced_classes", False)
    args.infonce = getattr(args, "infonce", False)
    args.project_features = getattr(args, "project_features", "none")
    args.non_affine_group_norm = getattr(args, "non_affine_group_norm", False)
    args.offset = getattr(args, "offset", "auto")
    args.activation = getattr(args, "activation", "relu")
    args.vq_type = getattr(args, "vq_type", "none")
    args.vq_vars = getattr(args, "vq_vars", 320)
    args.vq_groups = getattr(args, "vq_groups", 2)
    args.vq_dim = getattr(args, "vq_dim", 0)
    args.vq_depth = getattr(args, "vq_depth", 1)
    args.combine_groups = getattr(args, "combine_groups", False)
    args.vq_temp = getattr(args, "vq_temp", "(2.0, 0.5, 0.999995)")
    args.vq_gamma = getattr(args, "vq_gamma", 0.25)
