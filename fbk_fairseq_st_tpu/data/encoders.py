"""Pluggable tokenizers and BPE codecs (reference fairseq/data/encoders/*).

Registered under the 'tokenizer' and 'bpe' registries; each implements
``encode(str) -> str`` and ``decode(str) -> str`` on the string level
(binarization to ids stays in Dictionary.encode_line). Implementations with
external dependencies (sacremoses, nltk, sentencepiece, subword_nmt,
fastBPE) degrade to clear ImportErrors at build time — the deps are
optional in the environment, as they were for the reference.
"""

from __future__ import annotations

from ..registry import BPES, TOKENIZERS


def build_tokenizer(args):
    name = getattr(args, "tokenizer", None)
    if name is None:
        return None
    return TOKENIZERS[name].build_tokenizer(args)


def build_bpe(args):
    name = getattr(args, "bpe", None)
    if name is None:
        return None
    return BPES[name].build_bpe(args)


@TOKENIZERS.register("space")
class SpaceTokenizer:
    """reference encoders/space_tokenizer.py."""

    def __init__(self, args=None):
        import re

        self.space_tok = re.compile(r"\s+")

    @classmethod
    def build_tokenizer(cls, args):
        return cls(args)

    def encode(self, x: str) -> str:
        return self.space_tok.sub(" ", x).strip()

    def decode(self, x: str) -> str:
        return x


@TOKENIZERS.register("moses")
class MosesTokenizer:
    """reference encoders/moses_tokenizer.py (requires sacremoses)."""

    @staticmethod
    def add_args(parser):
        # reference moses_tokenizer.py:15-21
        parser.add_argument("--moses-source-lang", metavar="SRC",
                            help="source language")
        parser.add_argument("--moses-target-lang", metavar="TARGET",
                            help="target language")
        parser.add_argument("--moses-no-dash-splits", action="store_true",
                            default=False, help="don't apply dash split rules")
        parser.add_argument("--moses-no-escape", action="store_true",
                            default=False,
                            help="don't perform HTML escaping on apostrophy, "
                                 "quotes, etc.")

    def __init__(self, args):
        try:
            from sacremoses import MosesDetokenizer, MosesTokenizer as MT
        except ImportError:
            raise ImportError("Please install sacremoses for moses tokenization")
        # --moses-{source,target}-lang override the task languages
        # (reference moses_tokenizer.py:24-27)
        src = (getattr(args, "moses_source_lang", None)
               or getattr(args, "source_lang", "en") or "en")
        tgt = (getattr(args, "moses_target_lang", None)
               or getattr(args, "target_lang", "en") or "en")
        self.dash_splits = not getattr(args, "moses_no_dash_splits", False)
        self.escape = not getattr(args, "moses_no_escape", False)
        self.tok = MT(lang=src)
        self.detok = MosesDetokenizer(lang=tgt)

    @classmethod
    def build_tokenizer(cls, args):
        return cls(args)

    def encode(self, x: str) -> str:
        return self.tok.tokenize(
            x,
            aggressive_dash_splits=self.dash_splits,
            return_str=True,
            escape=self.escape,
        )

    def decode(self, x: str) -> str:
        return self.detok.detokenize(x.split())


@TOKENIZERS.register("nltk")
class NLTKTokenizer:
    def __init__(self, args):
        try:
            from nltk.tokenize import word_tokenize

            self.word_tokenize = word_tokenize
        except ImportError:
            raise ImportError("Please install nltk for nltk tokenization")

    @classmethod
    def build_tokenizer(cls, args):
        return cls(args)

    def encode(self, x: str) -> str:
        return " ".join(self.word_tokenize(x))

    def decode(self, x: str) -> str:
        return x


@BPES.register("bytes")
class Bytes:
    """reference encoders/bytes.py: UTF-8 byte-level segmentation."""

    @classmethod
    def build_bpe(cls, args):
        return cls()

    def encode(self, x: str) -> str:
        return " ".join(map(str, x.encode("utf-8")))

    def decode(self, x: str) -> str:
        return bytes(int(b) for b in x.split()).decode("utf-8", errors="replace")


@BPES.register("characters")
class Characters:
    """reference encoders/characters.py."""

    WORD_SEP = "_"

    @classmethod
    def build_bpe(cls, args):
        return cls()

    def encode(self, x: str) -> str:
        escaped = x.replace(" ", self.WORD_SEP)
        return " ".join(list(escaped))

    def decode(self, x: str) -> str:
        return x.replace(" ", "").replace(self.WORD_SEP, " ")


@BPES.register("sentencepiece")
class SentencepieceBPE:
    """reference encoders/sentencepiece_bpe.py (requires sentencepiece)."""

    @staticmethod
    def add_args(parser):
        # reference sentencepiece_bpe.py:16
        parser.add_argument("--sentencepiece-vocab", type=str,
                            help="path to sentencepiece vocab")

    def __init__(self, args):
        try:
            import sentencepiece as spm
        except ImportError:
            raise ImportError(
                "Please install sentencepiece for sentencepiece BPE"
            )
        model = (getattr(args, "sentencepiece_vocab", None)
                 or getattr(args, "sentencepiece_model", None))
        self.sp = spm.SentencePieceProcessor()
        self.sp.Load(model)

    @classmethod
    def build_bpe(cls, args):
        return cls(args)

    def encode(self, x: str) -> str:
        return " ".join(self.sp.EncodeAsPieces(x))

    def decode(self, x: str) -> str:
        return x.replace(" ", "").replace("▁", " ").strip()


@BPES.register("subword_nmt")
class SubwordNMTBPE:
    @staticmethod
    def add_args(parser):
        # reference subword_nmt_bpe.py:16-18
        parser.add_argument("--bpe-codes", type=str,
                            help="path to subword NMT BPE")
        parser.add_argument("--bpe-separator", default="@@",
                            help="BPE separator")

    def __init__(self, args):
        try:
            from subword_nmt import apply_bpe
        except ImportError:
            raise ImportError("Please install subword_nmt")
        codes = open(args.bpe_codes, encoding="utf-8")
        self.bpe = apply_bpe.BPE(
            codes,
            getattr(args, "bpe_separator", "@@"),
        )
        self.sep = getattr(args, "bpe_separator", "@@") + " "

    @classmethod
    def build_bpe(cls, args):
        return cls(args)

    def encode(self, x: str) -> str:
        return self.bpe.process_line(x)

    def decode(self, x: str) -> str:
        return (x + " ").replace(self.sep, "").rstrip()


@BPES.register("gpt2")
class GPT2BPE:
    """GPT-2 byte-level BPE via the available transformers tokenizer
    (reference encoders/gpt2_bpe.py downloads the same vocab)."""

    @staticmethod
    def add_args(parser):
        # reference gpt2_bpe.py:22-26 (defaults there are download URLs;
        # with zero egress a local path is required, so default to the
        # hub-cached "gpt2" tokenizer instead)
        parser.add_argument("--gpt2-encoder-json", type=str, default=None,
                            help="path to encoder.json")
        parser.add_argument("--gpt2-vocab-bpe", type=str, default=None,
                            help="path to vocab.bpe")

    def __init__(self, args):
        try:
            from transformers import GPT2Tokenizer

            encoder_json = getattr(args, "gpt2_encoder_json", None)
            vocab_bpe = getattr(args, "gpt2_vocab_bpe", None)
            if encoder_json and vocab_bpe:
                # explicit vocab/merges files (the reference layout)
                self.bpe = GPT2Tokenizer(
                    vocab_file=encoder_json, merges_file=vocab_bpe
                )
            else:
                self.bpe = GPT2Tokenizer.from_pretrained(
                    encoder_json or "gpt2"
                )
        except Exception as e:
            raise ImportError(f"GPT-2 BPE unavailable: {e}")

    @classmethod
    def build_bpe(cls, args):
        return cls(args)

    def encode(self, x: str) -> str:
        return " ".join(map(str, self.bpe.encode(x)))

    def decode(self, x: str) -> str:
        return self.bpe.decode([int(t) for t in x.split()])


@BPES.register("bert")
class BertBPE:
    @staticmethod
    def add_args(parser):
        # reference hf_bert_bpe.py:15-19
        parser.add_argument("--bpe-cased", action="store_true", default=False,
                            help="set for cased BPE")
        parser.add_argument("--bpe-vocab-file", type=str,
                            help="bpe vocab file.")

    def __init__(self, args):
        try:
            from transformers import BertTokenizer

            vocab_file = getattr(args, "bpe_vocab_file", None)
            if vocab_file:
                self.bpe = BertTokenizer(
                    vocab_file,
                    do_lower_case=not getattr(args, "bpe_cased", False),
                )
            else:
                self.bpe = BertTokenizer.from_pretrained(
                    "bert-base-cased"
                    if getattr(args, "bpe_cased", False)
                    else "bert-base-uncased"
                )
        except Exception as e:
            raise ImportError(f"BERT BPE unavailable: {e}")

    @classmethod
    def build_bpe(cls, args):
        return cls(args)

    def encode(self, x: str) -> str:
        return " ".join(self.bpe.tokenize(x))

    def decode(self, x: str) -> str:
        return self.bpe.convert_tokens_to_string(x.split())


@BPES.register("fastbpe")
class FastBPE:
    @staticmethod
    def add_args(parser):
        # reference fastbpe.py: shares the --bpe-codes spelling with
        # subword_nmt (only one --bpe is active per run)
        parser.add_argument("--bpe-codes", type=str,
                            help="path to fastBPE BPE")

    def __init__(self, args):
        try:
            import fastBPE

            self.bpe = fastBPE.fastBPE(args.bpe_codes)
        except ImportError:
            raise ImportError("Please install fastBPE")
        self.sep = "@@ "

    @classmethod
    def build_bpe(cls, args):
        return cls(args)

    def encode(self, x: str) -> str:
        return self.bpe.apply([x])[0]

    def decode(self, x: str) -> str:
        return (x + " ").replace(self.sep, "").rstrip()


# -- byte-level helpers (reference encoders/byte_utils.py) --------------------

import re as _re

_WHITESPACE_NORMALIZER = _re.compile(r"\s+")
_SPACE = chr(32)
_SPACE_ESCAPE = chr(9601)
_PRINTABLE_LATIN = set(
    list(range(32, 126 + 1)) + list(range(161, 172 + 1))
    + list(range(174, 255 + 1))
)
_BYTE_TO_BCHAR = {
    b: chr(b) if b in _PRINTABLE_LATIN else chr(256 + b) for b in range(256)
}
_BCHAR_TO_BYTE = {bc: b for b, bc in _BYTE_TO_BCHAR.items()}


def byte_encode(x: str) -> str:
    normalized = _WHITESPACE_NORMALIZER.sub(_SPACE, x)
    return "".join(_BYTE_TO_BCHAR[b] for b in normalized.encode("utf-8"))


def byte_decode(x: str) -> str:
    try:
        return bytes(_BCHAR_TO_BYTE[bc] for bc in x).decode("utf-8")
    except (ValueError, KeyError):
        return ""


def smart_byte_decode(x: str) -> str:
    """Best-effort recovery of broken UTF-8 byte-char strings via the
    max-valid-chars DP (reference byte_utils.py:34-51)."""
    output = byte_decode(x)
    if output == "":
        n = len(x)
        f = [0] * (n + 1)
        pt = [0] * (n + 1)
        for i in range(1, n + 1):
            f[i], pt[i] = f[i - 1], i - 1
            for j in range(1, min(4, i) + 1):
                if f[i - j] + 1 > f[i] and len(byte_decode(x[i - j:i])) > 0:
                    f[i], pt[i] = f[i - j] + 1, i - j
        cur = n
        while cur > 0:
            if f[cur] == f[pt[cur]] + 1:
                output = byte_decode(x[pt[cur]:cur]) + output
            cur = pt[cur]
    return output


@BPES.register("byte_bpe")
class ByteBPE:
    """Byte-level BPE via sentencepiece over byte-chars (reference
    encoders/byte_bpe.py, examples/byte_level_bpe)."""

    @staticmethod
    def add_args(parser):
        # reference byte_bpe.py:18
        parser.add_argument("--sentencepiece-model-path", type=str,
                            help="path to sentencepiece model")

    def __init__(self, args):
        try:
            import sentencepiece as spm
        except ImportError:
            raise ImportError("Please install sentencepiece for byte_bpe")
        self.sp = spm.SentencePieceProcessor()
        self.sp.Load(args.sentencepiece_model_path)

    @classmethod
    def build_bpe(cls, args):
        return cls(args)

    def encode(self, x: str) -> str:
        return _SPACE.join(self.sp.EncodeAsPieces(byte_encode(x)))

    @staticmethod
    def decode(x: str) -> str:
        unescaped = x.replace(_SPACE, "").replace(_SPACE_ESCAPE, _SPACE)
        return smart_byte_decode(unescaped)


@BPES.register("hf_byte_bpe")
class HuggingFaceByteLevelBPE:
    """GPT-2-style byte-level BPE from vocab.json + merges.txt (reference
    encoders/hf_byte_bpe.py), via the available transformers tokenizer."""

    @staticmethod
    def add_args(parser):
        # reference hf_byte_bpe.py:15-18
        parser.add_argument("--bpe-merges", help="path to merges.txt")
        parser.add_argument("--bpe-vocab", help="path to vocab.json")
        parser.add_argument("--bpe-add-prefix-space", action="store_true",
                            default=False,
                            help="add prefix space before encoding")

    def __init__(self, args):
        try:
            from tokenizers import ByteLevelBPETokenizer

            self.bpe = ByteLevelBPETokenizer(
                args.bpe_vocab, args.bpe_merges,
                add_prefix_space=getattr(args, "bpe_add_prefix_space", False),
            )
        except ImportError:
            raise ImportError(
                "Please install huggingface/tokenizers for hf_byte_bpe"
            )

    @classmethod
    def build_bpe(cls, args):
        return cls(args)

    def encode(self, x: str) -> str:
        return " ".join(map(str, self.bpe.encode(x).ids))

    def decode(self, x: str) -> str:
        return self.bpe.decode(
            [int(tok) if tok not in {"<unk>", "<mask>"} else tok
             for tok in x.split()]
        )

    def is_beginning_of_word(self, x: str) -> bool:
        return self.decode(x).startswith(" ")
