"""Shared transformer CLI flags (reference TransformerModel.add_args,
fairseq/models/transformer.py:60-140), reused by every transformer-family
model so checkpointed args namespaces stay flag-compatible with the fork."""

from __future__ import annotations

from ..ops.core import ACTIVATIONS


def add_transformer_args(parser) -> None:
    parser.add_argument(
        "--activation-fn", choices=sorted(ACTIVATIONS), help="activation function to use"
    )
    parser.add_argument("--dropout", type=float, metavar="D", help="dropout probability")
    parser.add_argument(
        "--attention-dropout", type=float, metavar="D",
        help="dropout probability for attention weights",
    )
    parser.add_argument(
        "--activation-dropout", "--relu-dropout", type=float, metavar="D",
        dest="relu_dropout", help="dropout probability after activation in FFN.",
    )
    parser.add_argument("--encoder-embed-path", type=str, metavar="STR",
                        help="path to pre-trained encoder embedding")
    parser.add_argument("--encoder-embed-dim", type=int, metavar="N",
                        help="encoder embedding dimension")
    parser.add_argument("--encoder-ffn-embed-dim", type=int, metavar="N",
                        help="encoder embedding dimension for FFN")
    parser.add_argument("--encoder-layers", type=int, metavar="N",
                        help="num encoder layers")
    parser.add_argument("--encoder-attention-heads", type=int, metavar="N",
                        help="num encoder attention heads")
    parser.add_argument("--encoder-normalize-before", action="store_true",
                        help="apply layernorm before each encoder block")
    parser.add_argument("--encoder-learned-pos", action="store_true",
                        help="use learned positional embeddings in the encoder")
    parser.add_argument("--decoder-embed-path", type=str, metavar="STR",
                        help="path to pre-trained decoder embedding")
    parser.add_argument("--decoder-embed-dim", type=int, metavar="N",
                        help="decoder embedding dimension")
    parser.add_argument("--decoder-ffn-embed-dim", type=int, metavar="N",
                        help="decoder embedding dimension for FFN")
    parser.add_argument("--decoder-layers", type=int, metavar="N",
                        help="num decoder layers")
    parser.add_argument("--decoder-attention-heads", type=int, metavar="N",
                        help="num decoder attention heads")
    parser.add_argument("--decoder-learned-pos", action="store_true",
                        help="use learned positional embeddings in the decoder")
    parser.add_argument("--decoder-normalize-before", action="store_true",
                        help="apply layernorm before each decoder block")
    parser.add_argument("--decoder-output-dim", type=int, metavar="N",
                        help="decoder output dimension")
    parser.add_argument("--share-decoder-input-output-embed", action="store_true",
                        help="share decoder input and output embeddings")
    parser.add_argument("--share-all-embeddings", action="store_true",
                        help="share encoder, decoder and output embeddings")
    parser.add_argument("--no-token-positional-embeddings", action="store_true",
                        help="if set, disables positional embeddings")
    parser.add_argument("--layernorm-embedding", action="store_true",
                        help="add layernorm to embedding")
    parser.add_argument("--no-scale-embedding", action="store_true",
                        help="if True, dont scale embeddings")
    parser.add_argument("--encoder-layerdrop", type=float, metavar="D",
                        default=0, help="LayerDrop probability for encoder")
    parser.add_argument("--decoder-layerdrop", type=float, metavar="D",
                        default=0, help="LayerDrop probability for decoder")
    parser.add_argument("--encoder-layers-to-keep", default=None,
                        help="layers to keep when pruning (comma-separated)")
    parser.add_argument("--decoder-layers-to-keep", default=None,
                        help="layers to keep when pruning (comma-separated)")
    parser.add_argument("--adaptive-softmax-cutoff", metavar="EXPR",
                        help="comma separated list of adaptive softmax cutoff points")
    parser.add_argument("--adaptive-softmax-dropout", type=float, metavar="D",
                        help="sets adaptive softmax dropout")
    # reference transformer.py:155-158
    parser.add_argument("--no-cross-attention", action="store_true",
                        default=False,
                        help="do not perform cross-attention")
    parser.add_argument("--cross-self-attention", action="store_true",
                        default=False,
                        help="perform cross+self-attention")
    # reference transformer.py:169-174 (quant-noise training for later
    # PQ/scalar quantization; see quantization/quant_noise.py)
    parser.add_argument("--quant-noise-pq", type=float, metavar="D",
                        default=0,
                        help="iterative PQ quantization noise at training "
                             "time")
    parser.add_argument("--quant-noise-pq-block-size", type=int, metavar="D",
                        default=8,
                        help="block size of quantization noise at training "
                             "time")
    parser.add_argument("--quant-noise-scalar", type=float, metavar="D",
                        default=0,
                        help="scalar quantization noise and scalar "
                             "quantization at training time")
