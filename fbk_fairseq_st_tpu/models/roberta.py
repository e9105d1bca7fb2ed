"""RoBERTa: robustly optimized BERT encoder with classification heads.

Counterpart of fairseq/models/roberta/model.py:35-387 (RobertaModel /
RobertaEncoder / RobertaLMHead / RobertaClassificationHead) with the
roberta / roberta_base / roberta_large / xlm presets. Same skeleton as the
reference's TransformerSentenceEncoder: learned positions, no segment
embeddings, pre-norm layers, LM head tied to the input embedding (unless
--untie-weights-roberta). Classification heads are registered on the model
(``register_classification_head``) and live under
``params["classification_heads"][name]``; fine-tuning merges freshly
initialized head params into loaded pretrained variables via
``init_head_params``. As with masked_lm, the LM head projects all positions
(static shapes) and the criterion masks the loss."""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops.core import (
    RngStream,
    dropout,
    embedding,
    get_activation,
    init_embedding,
    init_layer_norm,
    init_linear,
    layer_norm,
    linear,
)
from ..ops.positional import PositionalEmbedding
from ..ops.transformer_layer import (
    TransformerLayerConfig,
    encoder_layer,
    init_encoder_layer,
)
from ..registry import register_model, register_model_architecture
from .base import Model


class RobertaConfig(NamedTuple):
    vocab_size: int
    embed_dim: int = 768
    ffn_dim: int = 3072
    layers: int = 12
    heads: int = 12
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    pooler_dropout: float = 0.0
    activation: str = "gelu"
    pooler_activation: str = "tanh"
    untie_weights: bool = False
    max_positions: int = 512
    padding_idx: int = 1
    quant_noise_pq: float = 0.0
    quant_noise_block: int = 8

    @property
    def layer_cfg(self) -> TransformerLayerConfig:
        return TransformerLayerConfig(
            embed_dim=self.embed_dim,
            ffn_dim=self.ffn_dim,
            num_heads=self.heads,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            activation=self.activation,
            normalize_before=True,  # reference roberta/model.py:297
            quant_noise_pq=self.quant_noise_pq,
            quant_noise_block=self.quant_noise_block,
        )


class HeadConfig(NamedTuple):
    num_classes: int
    inner_dim: int


@register_model("roberta")
class RobertaModel(Model):
    def __init__(self, cfg: RobertaConfig):
        self.cfg = cfg
        self.pos = PositionalEmbedding(
            cfg.max_positions, cfg.embed_dim, cfg.padding_idx, learned=True
        )
        self.classification_heads: Dict[str, HeadConfig] = {}
        self.max_source_positions = cfg.max_positions
        self.max_target_positions = cfg.max_positions

    @property
    def supported_targets(self):
        return {"self"}  # reference roberta/model.py:147-149

    @staticmethod
    def add_args(parser):
        # reference roberta/model.py:57-102
        parser.add_argument("--encoder-layers", type=int, metavar="L")
        parser.add_argument("--encoder-embed-dim", type=int, metavar="H")
        parser.add_argument("--encoder-ffn-embed-dim", type=int, metavar="F")
        parser.add_argument("--encoder-attention-heads", type=int, metavar="A")
        parser.add_argument("--activation-fn", type=str)
        parser.add_argument("--pooler-activation-fn", type=str)
        parser.add_argument("--encoder-normalize-before", action="store_true")
        parser.add_argument("--dropout", type=float, metavar="D")
        parser.add_argument("--attention-dropout", type=float, metavar="D")
        parser.add_argument("--activation-dropout", type=float, metavar="D")
        parser.add_argument("--pooler-dropout", type=float, metavar="D")
        parser.add_argument("--max-positions", type=int)
        parser.add_argument("--load-checkpoint-heads", action="store_true")
        parser.add_argument("--untie-weights-roberta", action="store_true")
        # reference roberta/model.py:93-98
        parser.add_argument("--quant-noise-pq", type=float, metavar="D",
                            default=0,
                            help="iterative PQ quantization noise at "
                                 "training time")
        parser.add_argument("--quant-noise-pq-block-size", type=int,
                            metavar="D", default=8,
                            help="block size of quantization noise at "
                                 "training time")
        parser.add_argument("--quant-noise-scalar", type=float, metavar="D",
                            default=0,
                            help="scalar quantization noise and scalar "
                                 "quantization at training time")

    @classmethod
    def build_model(cls, args, task):
        base_architecture(args)
        if not hasattr(args, "max_positions"):
            args.max_positions = getattr(args, "tokens_per_sample", 512)
        d = task.source_dictionary
        cfg = RobertaConfig(
            vocab_size=len(d),
            embed_dim=args.encoder_embed_dim,
            ffn_dim=args.encoder_ffn_embed_dim,
            layers=args.encoder_layers,
            heads=args.encoder_attention_heads,
            dropout=args.dropout,
            attention_dropout=args.attention_dropout,
            activation_dropout=args.activation_dropout,
            pooler_dropout=args.pooler_dropout,
            activation=args.activation_fn,
            pooler_activation=args.pooler_activation_fn,
            untie_weights=getattr(args, "untie_weights_roberta", False),
            max_positions=args.max_positions,
            padding_idx=d.pad(),
            quant_noise_pq=getattr(args, "quant_noise_pq", 0) or 0.0,
            quant_noise_block=getattr(
                args, "quant_noise_pq_block_size", 8
            ) or 8,
        )
        model = cls(cfg)
        # fine-tuning recipes register the head before init (reference
        # sentence_prediction criterion contract)
        if getattr(args, "criterion", None) == "sentence_prediction":
            model.register_classification_head(
                getattr(
                    args, "classification_head_name",
                    "sentence_classification_head",
                ),
                num_classes=args.num_classes,
            )
        return model

    def register_classification_head(self, name, num_classes=None,
                                     inner_dim=None, **kwargs):
        """Reference roberta/model.py:124-144."""
        self.classification_heads[name] = HeadConfig(
            num_classes=num_classes,
            inner_dim=inner_dim or self.cfg.embed_dim,
        )

    def init_head_params(self, key, name: str):
        cfg = self.cfg
        head = self.classification_heads[name]
        k1, k2 = jax.random.split(key)
        return {
            "dense": init_linear(k1, cfg.embed_dim, head.inner_dim),
            "out_proj": init_linear(k2, head.inner_dim, head.num_classes),
        }

    def init(self, key):
        cfg = self.cfg
        ks = jax.random.split(key, cfg.layers + 6 + len(self.classification_heads))
        p: Dict[str, Any] = {
            "embed_tokens": init_embedding(
                ks[0], cfg.vocab_size, cfg.embed_dim, cfg.padding_idx
            ),
            "embed_positions": self.pos.init(ks[1]),
            "layers": [
                init_encoder_layer(ks[2 + i], cfg.layer_cfg)
                for i in range(cfg.layers)
            ],
            "final_ln": init_layer_norm(cfg.embed_dim),
            "lm_head_transform": init_linear(ks[-1], cfg.embed_dim, cfg.embed_dim),
            "lm_head_ln": init_layer_norm(cfg.embed_dim),
            "lm_output_bias": jnp.zeros((cfg.vocab_size,)),
        }
        if cfg.untie_weights:
            p["embed_out"] = init_linear(
                ks[-2], cfg.embed_dim, cfg.vocab_size, bias=False
            )
        if self.classification_heads:
            p["classification_heads"] = {
                name: self.init_head_params(ks[-3 - i], name)
                for i, name in enumerate(sorted(self.classification_heads))
            }
        return {"params": p, "state": {}}

    def extract_features(self, p, src_tokens, rng=None, deterministic=True,
                         dtype=jnp.float32):
        cfg = self.cfg
        rng = rng or RngStream(None)
        x = embedding(p["embed_tokens"], src_tokens, dtype)
        x = x + self.pos.from_ids(p["embed_positions"], src_tokens, dtype)
        x = dropout(x, cfg.dropout, rng, deterministic)
        padding_mask = src_tokens == cfg.padding_idx
        for lp in p["layers"]:
            x = encoder_layer(
                lp, cfg.layer_cfg, x,
                key_padding_mask=padding_mask,
                rng=rng, deterministic=deterministic,
            )
        return layer_norm(p["final_ln"], x)

    def output_layer(self, p, features):
        """RobertaLMHead (reference roberta/model.py:354-376)."""
        cfg = self.cfg
        h = layer_norm(
            p["lm_head_ln"],
            get_activation(cfg.activation)(
                linear(p["lm_head_transform"], features)
            ),
        )
        if cfg.untie_weights:
            logits = linear(p["embed_out"], h)
        else:
            logits = h @ p["embed_tokens"]["w"].T.astype(h.dtype)
        return logits + p["lm_output_bias"].astype(logits.dtype)

    def classification_head(self, p, features, name, rng=None,
                            deterministic=True):
        """RobertaClassificationHead (reference roberta/model.py:379-400):
        [CLS] feature -> dropout -> dense+act -> dropout -> out_proj."""
        cfg = self.cfg
        rng = rng or RngStream(None)
        hp = p["classification_heads"][name]
        x = features[:, 0, :]
        x = dropout(x, cfg.pooler_dropout, rng, deterministic)
        x = get_activation(cfg.pooler_activation)(linear(hp["dense"], x))
        x = dropout(x, cfg.pooler_dropout, rng, deterministic)
        return linear(hp["out_proj"], x)

    def forward(self, variables, batch, rng: Optional[RngStream] = None,
                training=False, features_only=False,
                classification_head_name=None):
        p = variables["params"]
        feats = self.extract_features(
            p, batch["src_tokens"], rng, not training
        )
        extra: Dict[str, Any] = {"features": feats}
        if classification_head_name is not None:
            logits = self.classification_head(
                p, feats, classification_head_name, rng, not training
            )
        elif features_only:
            logits = feats
        else:
            logits = self.output_layer(p, feats)
        return (logits, extra), {}


@register_model_architecture("roberta", "roberta")
def base_architecture(args):
    """Reference roberta/model.py:349-365."""
    args.encoder_layers = getattr(args, "encoder_layers", 12)
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 768)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 3072)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 12)
    args.activation_fn = getattr(args, "activation_fn", "gelu")
    args.pooler_activation_fn = getattr(args, "pooler_activation_fn", "tanh")
    args.dropout = getattr(args, "dropout", 0.1)
    args.attention_dropout = getattr(args, "attention_dropout", 0.1)
    args.activation_dropout = getattr(args, "activation_dropout", 0.0)
    args.pooler_dropout = getattr(args, "pooler_dropout", 0.0)


@register_model_architecture("roberta", "roberta_base")
def roberta_base_architecture(args):
    base_architecture(args)


@register_model_architecture("roberta", "roberta_large")
def roberta_large_architecture(args):
    args.encoder_layers = getattr(args, "encoder_layers", 24)
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 1024)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 4096)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 16)
    base_architecture(args)


class RobertaHubInterface:
    """Convenience wrapper for a loaded RoBERTa (reference
    roberta/hub_interface.py:20-190): encode/decode, feature extraction,
    classification-head prediction and <mask> filling."""

    def __init__(self, args, task, model, variables):
        self.args = args
        self.task = task
        self.model = model
        self.variables = variables
        self.bpe = None
        try:
            from ..data.encoders import build_bpe

            if getattr(args, "bpe", None):
                self.bpe = build_bpe(args)
        except Exception:  # optional dependency missing
            self.bpe = None

    @property
    def dictionary(self):
        return self.task.source_dictionary

    def encode(self, sentence: str, *addl_sentences, no_separator=False):
        import numpy as np

        if self.bpe is not None:
            sentence = self.bpe.encode(sentence)
        text = "<s> " + sentence + " </s>"
        for s in addl_sentences:
            if self.bpe is not None:
                s = self.bpe.encode(s)
            text += (" </s>" if not no_separator else "") + " " + s + " </s>"
        ids = self.dictionary.encode_line(
            text, add_if_not_exist=False, append_eos=False
        )
        return np.asarray(ids, np.int64)

    def decode(self, tokens) -> str:
        import numpy as np

        tokens = np.asarray(tokens)
        if len(tokens) and tokens[0] == self.dictionary.bos():
            tokens = tokens[1:]
        sentences = []
        cur = []
        for t in tokens:
            if t == self.dictionary.eos():
                if cur:
                    sentences.append(cur)
                cur = []
            else:
                cur.append(int(t))
        if cur:
            sentences.append(cur)
        out = [
            self.dictionary.string(np.asarray(s)) for s in sentences
        ]
        if self.bpe is not None:
            out = [self.bpe.decode(s) for s in out]
        return out[0] if len(out) == 1 else out

    def extract_features(self, tokens):
        import jax.numpy as jnp

        tokens = jnp.asarray(tokens)[None] if jnp.asarray(tokens).ndim == 1 \
            else jnp.asarray(tokens)
        (feats, _), _ = self.model.forward(
            self.variables, {"src_tokens": tokens}, features_only=True
        )
        return feats

    def predict(self, head: str, tokens, return_logits: bool = False):
        import jax
        import jax.numpy as jnp

        tokens = jnp.asarray(tokens)
        if tokens.ndim == 1:
            tokens = tokens[None]
        (logits, _), _ = self.model.forward(
            self.variables, {"src_tokens": tokens},
            classification_head_name=head,
        )
        if return_logits:
            return logits
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)

    def fill_mask(self, masked_input: str, topk: int = 5):
        import jax
        import jax.numpy as jnp
        import numpy as np

        assert "<mask>" in masked_input
        tokens = self.encode(masked_input.replace("<mask>", " <mask> "))
        mask_idx = self.dictionary.index("<mask>")
        pos = int(np.nonzero(tokens == mask_idx)[0][0])
        (logits, _), _ = self.model.forward(
            self.variables, {"src_tokens": jnp.asarray(tokens)[None]}
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)[0, pos]
        values, indices = jax.lax.top_k(probs, topk)
        out = []
        for v, i in zip(np.asarray(values), np.asarray(indices)):
            word = self.dictionary[int(i)]
            if self.bpe is not None:
                try:
                    word = self.bpe.decode(word)
                except Exception:
                    pass
            out.append(
                (masked_input.replace("<mask>", word.strip()), float(v),
                 word.strip())
            )
        return out


@register_model("xlmr")
class XLMRModel(RobertaModel):
    """XLM-R (reference roberta/model_xlmr.py:15-37): RoBERTa trained on
    CommonCrawl-100; sentencepiece BPE by default in from_pretrained."""


@register_model_architecture("xlmr", "xlmr_base")
def xlmr_base_architecture(args):
    base_architecture(args)


@register_model_architecture("xlmr", "xlmr_large")
def xlmr_large_architecture(args):
    roberta_large_architecture(args)


@register_model("camembert")
class CamembertModel(RobertaModel):
    """CamemBERT (reference roberta/model_camembert.py): French RoBERTa."""


@register_model_architecture("camembert", "camembert_base")
def camembert_base_architecture(args):
    base_architecture(args)


@register_model_architecture("roberta", "xlm")
def xlm_architecture(args):
    args.encoder_layers = getattr(args, "encoder_layers", 16)
    args.encoder_embed_dim = getattr(args, "encoder_embed_dim", 1280)
    args.encoder_ffn_embed_dim = getattr(args, "encoder_ffn_embed_dim", 1280 * 4)
    args.encoder_attention_heads = getattr(args, "encoder_attention_heads", 16)
    base_architecture(args)
