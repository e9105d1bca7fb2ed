"""hf_gpt2: Hugging Face GPT-2 as a language model.

Counterpart of fairseq/models/huggingface/hf_gpt2.py (which wraps the torch
GPT2LMHeadModel); here the Flax GPT-2 from `transformers` slots directly
into the jitted training/decode path. --hf-gpt2-path loads local pretrained
weights (the environment has no network egress); otherwise the model is
randomly initialized from the configured sizes."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.core import RngStream
from ..registry import register_model, register_model_architecture
from .base import Model

DEFAULT_MAX_TARGET_POSITIONS = 1024


@register_model("hf_gpt2")
class HuggingFaceGPT2LanguageModel(Model):
    def __init__(self, hf_model, pad_idx: int, max_positions: int):
        self.hf_model = hf_model
        self.pad_idx = pad_idx
        self.max_source_positions = max_positions
        self.max_target_positions = max_positions

    @staticmethod
    def add_args(parser):
        # reference huggingface/hf_gpt2.py add_args
        parser.add_argument("--embed-dim", type=int, metavar="N",
                            help="embedding dimension")
        parser.add_argument("--num-attention-heads", type=int, metavar="N")
        parser.add_argument("--num-layers", type=int, metavar="N")
        parser.add_argument("--dropout", type=float, metavar="D")
        parser.add_argument("--attention-dropout", type=float, metavar="D")
        parser.add_argument("--hf-gpt2-path", type=str, default=None,
                            help="local path to pretrained HF GPT-2 weights")

    @classmethod
    def build_model(cls, args, task):
        from transformers import FlaxGPT2LMHeadModel, GPT2Config

        default_architecture(args)
        max_positions = getattr(
            args, "max_target_positions",
            getattr(args, "tokens_per_sample", DEFAULT_MAX_TARGET_POSITIONS),
        ) or DEFAULT_MAX_TARGET_POSITIONS
        d = task.target_dictionary
        if getattr(args, "hf_gpt2_path", None):
            hf_model = FlaxGPT2LMHeadModel.from_pretrained(args.hf_gpt2_path)
        else:
            config = GPT2Config(
                vocab_size=len(d),
                n_positions=max_positions + 1,
                n_embd=args.embed_dim,
                n_layer=args.num_layers,
                n_head=args.num_attention_heads,
                resid_pdrop=args.dropout,
                embd_pdrop=args.dropout,
                attn_pdrop=args.attention_dropout,
                layer_norm_epsilon=1e-6,
            )
            hf_model = FlaxGPT2LMHeadModel(config)
        return cls(hf_model, d.pad(), max_positions)

    def init(self, key):
        return {"params": {"hf": self.hf_model.params}, "state": {}}

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False):
        tokens = batch["src_tokens"]
        attention_mask = (tokens != self.pad_idx).astype(jnp.int32)
        # GPT-2 has no pad embedding: clamp pads to 0 (masked out anyway)
        inputs = jnp.where(tokens == self.pad_idx, 0, tokens)
        dropout_rng = (
            rng.next() if (rng is not None and training) else None
        )
        out = self.hf_model(
            input_ids=inputs,
            attention_mask=attention_mask,
            params=variables["params"]["hf"],
            dropout_rng=dropout_rng,
            train=training,
        )
        return (out.logits, {"attn": None}), {}

    def encode(self, variables, src_tokens, src_lengths, rng=None,
               training=False):
        from .base import EncoderOut

        b = src_tokens.shape[0]
        return (
            EncoderOut(
                encoder_out=jnp.zeros((b, 1, 1)),
                encoder_padding_mask=jnp.zeros((b, 1), bool),
            ),
            {},
        )

    def init_cache(self, variables, batch, max_len, encoder_out,
                   dtype=jnp.float32):
        # decode by re-running the causal LM at full width each step
        return {
            "tokens": jnp.full((batch, max_len), self.pad_idx, jnp.int32)
        }

    def decode_step(self, variables, tokens, cache, step, encoder_out):
        buf = jax.lax.dynamic_update_slice_in_dim(
            cache["tokens"], tokens.astype(jnp.int32), step, axis=1
        )
        (logits, _), _ = self.forward(variables, {"src_tokens": buf})
        step_logits = jax.lax.dynamic_slice_in_dim(logits, step, 1, axis=1)[
            :, 0
        ]
        return step_logits, {"tokens": buf}, None


@register_model_architecture("hf_gpt2", "hf_gpt2")
def default_architecture(args):
    args.embed_dim = getattr(args, "embed_dim", 768)
    args.num_attention_heads = getattr(args, "num_attention_heads", 12)
    args.num_layers = getattr(args, "num_layers", 12)
    args.dropout = getattr(args, "dropout", 0.1)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)


@register_model_architecture("hf_gpt2", "hf_gpt2_medium")
def hf_gpt2_medium(args):
    args.embed_dim = getattr(args, "embed_dim", 1024)
    args.num_attention_heads = getattr(args, "num_attention_heads", 16)
    args.num_layers = getattr(args, "num_layers", 24)
    default_architecture(args)


@register_model_architecture("hf_gpt2", "hf_gpt2_large")
def hf_gpt2_large(args):
    args.embed_dim = getattr(args, "embed_dim", 1280)
    args.num_attention_heads = getattr(args, "num_attention_heads", 20)
    args.num_layers = getattr(args, "num_layers", 36)
    default_architecture(args)


@register_model_architecture("hf_gpt2", "hf_gpt2_xl")
def hf_gpt2_xl(args):
    args.embed_dim = getattr(args, "embed_dim", 1600)
    args.num_attention_heads = getattr(args, "num_attention_heads", 25)
    args.num_layers = getattr(args, "num_layers", 48)
    default_architecture(args)
