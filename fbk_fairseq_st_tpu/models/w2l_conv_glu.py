"""wav2letter-style Conv+GLU encoder-only ASR model.

Counterpart of examples/speech_recognition/models/w2l_conv_glu_enc.py
:42-200 (``asr_w2l_conv_glu_encoder``): a stack of same-padded 1-D
convolutions each followed by GLU (halving the channels) and dropout, then
two linear layers (GLU after the first), emitting per-frame vocabulary
logits for CTC training. The reference wraps every conv/linear in
weight_norm — a reparameterization of the same function; here the weights
are stored directly (the optimizer trajectory differs, the function class
is identical), as elsewhere in this framework's fconv family.

The reference pairs this encoder with the external wav2letter ASG
criterion/decoders; here it trains with the built-in ctc_loss (the ASG
path remains a documented external dependency, as in the reference)."""

from __future__ import annotations

import ast
import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from ..ops.core import RngStream, dropout, linear, normal_init
from ..registry import register_model, register_model_architecture
from .base import EncoderOut, Model

default_conv_enc_config = """[
    (400, 13, 170, 0.2),
    (440, 14, 0, 0.214),
    (484, 15, 0, 0.22898),
    (532, 16, 0, 0.2450086),
    (584, 17, 0, 0.262159202),
    (642, 18, 0, 0.28051034614),
    (706, 19, 0, 0.30014607037),
    (776, 20, 0, 0.321156295296),
    (852, 21, 0, 0.343637235966),
    (936, 22, 0, 0.367691842484),
    (1028, 23, 0, 0.393430271458),
    (1130, 24, 0, 0.42097039046),
    (1242, 25, 0, 0.450438317792),
    (1366, 26, 0, 0.481969000038),
    (1502, 27, 0, 0.51570683004),
    (1652, 28, 0, 0.551806308143),
    (1816, 29, 0, 0.590432749713),
]"""


@register_model("asr_w2l_conv_glu_encoder")
class W2lConvGluEncoderModel(Model):
    def __init__(self, vocab_size: int, input_feat: int,
                 conv_enc_config: List[Tuple[int, int, int, float]]):
        self.vocab_size = vocab_size
        self.input_feat = input_feat
        self.conv_enc_config = conv_enc_config
        self.max_source_positions = 1_000_000
        self.max_target_positions = 1_000_000

    @staticmethod
    def add_args(parser):
        parser.add_argument("--input-feat-per-channel", type=int, metavar="N",
                            help="encoder input dimension per input channel")
        parser.add_argument("--in-channels", type=int, metavar="N",
                            help="number of encoder input channels")
        parser.add_argument(
            "--conv-enc-config", type=str, metavar="EXPR",
            help="[(out_channels, kernel_size, padding, dropout), ...]",
        )

    @classmethod
    def build_model(cls, args, task):
        w2l_conv_glu_enc(args)
        if getattr(args, "in_channels", 1) != 1:
            raise ValueError("only 1 input channel is currently supported")
        cfg = ast.literal_eval(
            getattr(args, "conv_enc_config", None) or default_conv_enc_config
        )
        # the reference's forward asserts the conv stack preserves T
        # (w2l_conv_glu_enc.py:141); enforce the same contract up front so
        # src_lengths remain valid emission lengths for CTC/ASG
        delta = sum(2 * pad - k + 1 for _, k, pad, _ in cfg)
        if delta != 0:
            raise ValueError(
                "conv_enc_config must preserve sequence length "
                f"(net length change {delta:+d} frames); the reference "
                "model asserts this too"
            )
        model = cls(
            vocab_size=len(task.target_dictionary),
            input_feat=args.input_feat_per_channel,
            conv_enc_config=[tuple(t) for t in cfg],
        )
        # ASG's learned transition matrix lives in the model tree (the
        # criterion is stateless/pure here; same convention that keeps the
        # CTC head in the encoder)
        model.use_asg = getattr(args, "criterion", "") == "asg_loss"
        model.asg_transitions_init = getattr(
            args, "asg_transitions_init", 0.0
        )
        return model

    def init(self, key):
        p: Dict[str, Any] = {"convs": [], "linears": []}
        cur = self.input_feat
        for i, (out_c, k, _pad, _dp) in enumerate(self.conv_enc_config):
            if out_c % 2 != 0:
                raise ValueError("odd # of out_channels is incompatible with GLU")
            # wav2letter init: uniform conv init scaled by sqrt(3)
            std = math.sqrt(3.0 / (k * cur))
            p["convs"].append(
                {
                    "w": normal_init(
                        jax.random.fold_in(key, i), (k, cur, out_c), std=std
                    ),
                    "b": jnp.zeros((out_c,), jnp.float32),
                }
            )
            cur = out_c // 2
        for j, out_c in enumerate((2 * cur, self.vocab_size)):
            std = math.sqrt(3.0 / cur)
            p["linears"].append(
                {
                    "w": normal_init(
                        jax.random.fold_in(key, 1000 + j), (cur, out_c),
                        std=std,
                    ),
                    "b": jnp.zeros((out_c,), jnp.float32),
                }
            )
            cur = out_c // 2
        if getattr(self, "use_asg", False):
            p["asg_transitions"] = self.asg_transitions_init * jnp.eye(
                self.vocab_size, dtype=jnp.float32
            )
        return {"params": p, "state": {}}

    def _forward_encoder(self, params, x, src_lengths, rng, deterministic):
        """x: (B, T, F) -> per-frame vocab logits (B, T, V) (reference
        forward :120-155; same-length output, reference asserts T
        unchanged)."""
        rng = rng or RngStream(None)
        for i, (out_c, k, pad, dp) in enumerate(self.conv_enc_config):
            conv = params["convs"][i]
            x = jax.lax.conv_general_dilated(
                x, conv["w"].astype(x.dtype), (1,), padding=((pad, pad),),
                dimension_numbers=("NWC", "WIO", "NWC"),
            ) + conv["b"].astype(x.dtype)
            a, b = jnp.split(x, 2, axis=-1)
            x = a * jax.nn.sigmoid(b)  # GLU over channels
            x = dropout(x, dp, rng, deterministic)
        x = linear(params["linears"][0], x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)
        x = dropout(x, self.conv_enc_config[-1][3], rng, deterministic)
        return linear(params["linears"][1], x)

    def encode(self, variables, src_tokens, src_lengths, rng=None,
               training=False):
        logits = self._forward_encoder(
            variables["params"], src_tokens, src_lengths, rng, not training
        )
        t = logits.shape[1]
        padding_mask = (
            jnp.arange(t)[None, :] >= jnp.asarray(src_lengths)[:, None]
        )
        return (
            EncoderOut(
                encoder_out=logits,
                encoder_padding_mask=padding_mask,
                src_lengths=jnp.asarray(src_lengths),
                ctc_out=logits,
                ctc_padding_mask=padding_mask,
                ctc_lengths=jnp.asarray(src_lengths),
            ),
            {},
        )

    def forward(self, variables, batch, rng=None, training=False):
        enc, _ = self.encode(
            variables, batch["src_tokens"], batch["src_lengths"], rng,
            training,
        )
        return (enc.encoder_out, {"encoder_out": enc}), {}


@register_model_architecture("asr_w2l_conv_glu_encoder", "w2l_conv_glu_enc")
def w2l_conv_glu_enc(args):
    args.input_feat_per_channel = getattr(args, "input_feat_per_channel", 80)
    args.in_channels = getattr(args, "in_channels", 1)
    args.conv_enc_config = getattr(
        args, "conv_enc_config", default_conv_enc_config
    )
