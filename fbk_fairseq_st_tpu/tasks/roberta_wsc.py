"""RoBERTa fine-tuning tasks: WSC, WinoGrande, CommonsenseQA.

Counterparts of the reference's roberta example tasks:
  * ``wsc``          — examples/roberta/wsc/wsc_task.py:32 (Winograd Schema
    Challenge; score the query noun phrase vs candidate noun phrases by the
    masked-LM pseudo-log-likelihood of the phrase substituted in place of
    the pronoun).
  * ``winogrande``   — wsc_task.py:267 (two candidates, one correct).
  * ``commonsense_qa`` — commonsense_qa/commonsense_qa_task.py:28 (5-way
    ranking over ``Q: ... A: choice`` concatenations via the
    sentence_ranking criterion and a 1-output classification head).

TPU-first deviations from the reference:
  * WSC candidates are collated into a padded ``(B, C, T)`` block with a
    validity mask, so the per-example Python loop of the reference criterion
    (wsc_criterion.py:72-100) becomes one batched, jit-compiled forward.
  * The reference extracts candidate noun chunks with spaCy
    (``en_core_web_lg``, wsc_utils.py:84-88) and detokenizes with
    sacremoses — neither external package is part of this framework's
    environment. Candidate extraction therefore resolves in priority
    order: a precomputed ``candidates`` list in the jsonl line, spaCy if
    importable, else a dependency-free heuristic chunker (documented on
    ``_heuristic_noun_chunks``).
"""

from __future__ import annotations

import json
import logging
import os
import re

import numpy as np

from ..data.dictionary import Dictionary
from ..data.datasets import Dataset
from ..registry import register_task
from .base import Task

logger = logging.getLogger(__name__)

_PRONOUNS = {
    "i", "me", "my", "mine", "you", "your", "yours", "he", "him", "his",
    "she", "her", "hers", "it", "its", "we", "us", "our", "ours", "they",
    "them", "their", "theirs", "this", "that", "these", "those", "myself",
    "yourself", "himself", "herself", "itself", "ourselves", "themselves",
}


def _detokenize(tokens):
    """Minimal Moses-style detokenizer (the reference uses sacremoses,
    wsc_utils.py:78-81): joins with spaces, then re-attaches punctuation
    and contractions."""
    out = " ".join(tokens)
    out = re.sub(r" ([.,;:!?%)\]}])", r"\1", out)
    out = re.sub(r"([(\[{$]) ", r"\1", out)
    out = re.sub(r" (n't|'s|'re|'ve|'ll|'d|'m)\b", r"\1", out)
    out = re.sub(r" ' ([a-z])", r" '\1", out)
    return out


def _heuristic_noun_chunks(text):
    """Dependency-free stand-in for spaCy noun chunks
    (wsc_utils.py:36-49): candidate spans are (a) maximal runs of
    capitalized words (proper nouns), (b) determiner/possessive followed by
    up to three lowercase words, (c) single non-pronoun content words
    adjacent to them. Recall-oriented: a superset of plausible noun phrases
    is fine because wrong candidates only add negative terms to the margin
    loss."""
    words = text.split()
    spans = []
    # (a) capitalized runs (skip sentence start)
    i = 0
    while i < len(words):
        w = re.sub(r"[^\w']", "", words[i])
        if i > 0 and w[:1].isupper():
            j = i
            while j < len(words) and re.sub(
                r"[^\w']", "", words[j]
            )[:1].isupper():
                j += 1
            spans.append((i, j))
            i = j
        else:
            i += 1
    # (b) determiner + following words
    dets = {"the", "a", "an", "his", "her", "its", "their", "my", "your",
            "our", "this", "that", "these", "those"}
    for i, w in enumerate(words):
        if w.lower() in dets:
            for j in range(i + 1, min(i + 4, len(words)) + 1):
                if j > i + 1:
                    spans.append((i, j))
                tail = re.sub(r"[^\w']", "", words[j - 1]) if j > i else ""
                if tail and tail[-1] in ".,!?;:":
                    break
    chunks = []
    seen = set()
    for s, e in sorted(spans):
        txt = _detokenize(
            [re.sub(r'[."]+$', "", w) for w in words[s:e]]
        ).strip()
        low = txt.lower()
        if not txt or low in seen or low in _PRONOUNS:
            continue
        seen.add(low)
        chunks.append(txt)
    return chunks


def _extract_candidates(sample, text, query):
    """Candidate noun phrases for a WSC example, excluding the query
    (reference filter_noun_chunks, wsc_utils.py:213-236)."""
    if "candidates" in sample:
        chunks = list(sample["candidates"])
    else:
        try:  # reference pipeline when spaCy is importable
            import en_core_web_lg  # type: ignore

            nlp = en_core_web_lg.load()
            doc = nlp(text)
            chunks = [c.text for c in doc.noun_chunks]
        except ImportError:
            chunks = _heuristic_noun_chunks(text)
    out = []
    for c in chunks:
        low = c.lower()
        if low in _PRONOUNS or all(w in _PRONOUNS for w in low.split()):
            continue
        if query is not None and (
            low in query.lower() or query.lower() in low
        ):
            continue
        out.append(c)
    return out


class WSCLikeDataset(Dataset):
    """Collates query/candidate token+mask ragged lists into fixed blocks:
    queries -> (B, Tq), candidates -> (B, C, Tc) + validity mask."""

    def __init__(self, queries, query_masks, candidates, candidate_masks,
                 labels, pad_idx, sizes, shuffle=True):
        self.queries = queries          # list of 1-D int arrays (or None)
        self.query_masks = query_masks  # list of 1-D bool arrays
        self.candidates = candidates    # list of LISTS of 1-D int arrays
        self.candidate_masks = candidate_masks
        self.labels = labels            # list of {None, False, True}
        self.pad_idx = pad_idx
        self._sizes = np.asarray(sizes)
        self.shuffle = shuffle

    def __getitem__(self, index):
        return {"id": index}

    def __len__(self):
        return len(self.queries)

    def collater(self, samples, pad_to_src_len=None, pad_to_tgt_len=None,
                 pad_to_bsz=None):
        if len(samples) == 0:
            return {}
        idx = [s["id"] for s in samples]
        bsz = len(idx)
        if pad_to_bsz is not None:
            bsz = max(bsz, pad_to_bsz)
        tq = max(
            [1] + [len(self.queries[i]) for i in idx
                   if self.queries[i] is not None]
        )
        if pad_to_src_len is not None:
            tq = max(tq, pad_to_src_len)
        cmax = max(1, max(len(self.candidates[i]) for i in idx))
        tc = max(
            [1] + [len(t) for i in idx for t in self.candidates[i]]
        )
        if pad_to_src_len is not None:
            tc = max(tc, pad_to_src_len)

        q_toks = np.full((bsz, tq), self.pad_idx, np.int64)
        q_mask = np.zeros((bsz, tq), bool)
        q_valid = np.zeros((bsz,), bool)
        c_toks = np.full((bsz, cmax, tc), self.pad_idx, np.int64)
        c_mask = np.zeros((bsz, cmax, tc), bool)
        c_valid = np.zeros((bsz, cmax), bool)
        labels = np.full((bsz,), -1, np.int64)
        ntokens = 0
        for b, i in enumerate(idx):
            if self.queries[i] is not None:
                L = len(self.queries[i])
                q_toks[b, :L] = self.queries[i]
                q_mask[b, :L] = self.query_masks[i]
                q_valid[b] = True
                ntokens += L
            for c, (toks, mask) in enumerate(
                zip(self.candidates[i], self.candidate_masks[i])
            ):
                c_toks[b, c, : len(toks)] = toks
                c_mask[b, c, : len(mask)] = mask
                c_valid[b, c] = True
            if self.labels[i] is not None:
                labels[b] = int(bool(self.labels[i]))
        ids = np.array(idx + [-1] * (bsz - len(idx)), np.int64)
        return {
            "id": ids,
            "nsentences": len(idx),
            "ntokens": ntokens,
            "query_tokens": q_toks,
            "query_masks": q_mask,
            "query_valid": q_valid,
            "candidate_tokens": c_toks,
            "candidate_masks": c_mask,
            "candidate_valid": c_valid,
            "labels": labels,
            # nominal input for generic trainer plumbing
            "net_input": {
                "src_tokens": q_toks,
                "src_lengths": q_mask.sum(-1).astype(np.int64),
            },
        }

    def num_tokens(self, index):
        return int(self._sizes[index])

    def size(self, index):
        return int(self._sizes[index])

    @property
    def sizes(self):
        return self._sizes

    def ordered_indices(self):
        if self.shuffle:
            order = np.random.permutation(len(self)).astype(np.int64)
        else:
            order = np.arange(len(self), dtype=np.int64)
        return order


@register_task("wsc")
class WSCTask(Task):
    """Reference wsc_task.py:32-264."""

    @staticmethod
    def add_args(parser):
        parser.add_argument("data", metavar="DIR",
                            help="path to data directory; loads <split>.jsonl")
        parser.add_argument("--init-token", type=int, default=None,
                            help="add token at the beginning of each item")

    def __init__(self, args, vocab):
        super().__init__(args)
        self.vocab = vocab
        self.mask = vocab.add_symbol("<mask>")
        from ..data.encoders import build_bpe, build_tokenizer

        self.bpe = build_bpe(args)
        self.tokenizer = build_tokenizer(args)
        # GPT-2 BPE encodes leading spaces into tokens
        # (reference wsc_task.py:53-58)
        if getattr(args, "bpe", None) == "gpt2":
            self.leading_space, self.trailing_space = True, False
        else:
            self.leading_space, self.trailing_space = False, True

    @classmethod
    def load_dictionary(cls, filename):
        d = Dictionary.load(filename)
        d.add_symbol("<mask>")
        return d

    @classmethod
    def setup_task(cls, args, **kwargs):
        assert args.criterion == "wsc", "Must set --criterion=wsc"
        vocab = cls.load_dictionary(os.path.join(args.data, "dict.txt"))
        logger.info("dictionary: {} types".format(len(vocab)))
        return cls(args, vocab)

    # -- binarization (reference wsc_task.py:81-101) ----------------------

    def binarize(self, s: str, append_eos: bool = False):
        if self.tokenizer is not None:
            s = self.tokenizer.encode(s)
        if self.bpe is not None:
            s = self.bpe.encode(s)
        tokens = self.vocab.encode_line(
            s, append_eos=append_eos, add_if_not_exist=False
        ).astype(np.int64)
        if getattr(self.args, "init_token", None) is not None:
            tokens = np.concatenate([[self.args.init_token], tokens])
        return tokens

    def binarize_with_mask(self, txt, prefix, suffix, leading_space,
                           trailing_space):
        toks = self.binarize(
            prefix + leading_space + txt + trailing_space + suffix,
            append_eos=True,
        )
        mask = np.zeros(len(toks), bool)
        mask_start = len(self.binarize(prefix))
        mask_size = len(self.binarize(leading_space + txt))
        mask[mask_start: mask_start + mask_size] = True
        return toks, mask

    # -- data -------------------------------------------------------------

    def _iter_examples(self, data_path):
        """(sample, prefix, suffix, lead, trail, query, label) per line.

        The reference splits around the spaCy pronoun span
        (wsc_task.py:124-131); here the split uses the jsonl's own
        span2_index token position on the raw tokenization."""
        with open(data_path) as fin:
            for line in fin:
                sample = json.loads(line.strip())
                target = sample["target"]
                query = target["span1_text"]
                if query is not None:
                    if "\n" in query:
                        continue
                    if query.endswith(".") or query.endswith(","):
                        query = query[:-1]
                tokens = sample["text"].split(" ")
                idx = target["span2_index"]
                pronoun = target["span2_text"].rstrip('.,"')
                if tokens[idx].rstrip('.,"') != pronoun:
                    if idx + 1 < len(tokens) and tokens[
                        idx + 1
                    ].rstrip('.,"') == pronoun:
                        idx += 1
                    else:
                        raise ValueError("Misaligned pronoun!")
                trailing_punct = tokens[idx][len(pronoun):]
                prefix = _detokenize(tokens[:idx])
                suffix = _detokenize(
                    ([trailing_punct] if trailing_punct else [])
                    + tokens[idx + 1:]
                )
                lead = " " if idx > 0 else ""
                trail = (
                    "" if suffix.startswith((".", ","))
                    else (" " if idx + 1 < len(tokens) else "")
                )
                yield sample, prefix, suffix, lead, trail, query, sample.get(
                    "label", None
                )

    def load_dataset(self, split, epoch=1, combine=False, data_path=None,
                     return_only=False, **kwargs):
        if data_path is None:
            data_path = os.path.join(self.args.data, split + ".jsonl")
        if not os.path.exists(data_path):
            raise FileNotFoundError("Cannot find data: {}".format(data_path))

        queries, query_masks, cands, cand_masks, labels, sizes = (
            [], [], [], [], [], []
        )
        for (sample, prefix, suffix, lead, trail, query,
             label) in self._iter_examples(data_path):
            full_text = prefix + lead + sample["target"]["span2_text"] + (
                trail or " "
            ) + suffix
            if query is not None:
                q_toks, q_mask = self.binarize_with_mask(
                    query, prefix, suffix, lead, trail
                )
            else:
                q_toks, q_mask = None, None
            c_toks, c_masks = [], []
            for cand in _extract_candidates(sample, full_text, query):
                toks, mask = self.binarize_with_mask(
                    cand, prefix, suffix, lead, trail
                )
                c_toks.append(toks)
                c_masks.append(mask)
            queries.append(q_toks)
            query_masks.append(q_mask)
            cands.append(c_toks)
            cand_masks.append(c_masks)
            labels.append(label)
            sizes.append(len(q_toks) if q_toks is not None else 1)

        ds = WSCLikeDataset(
            queries, query_masks, cands, cand_masks, labels,
            self.vocab.pad(), sizes, shuffle=not return_only,
        )
        if return_only:
            return ds
        self.datasets[split] = ds
        return ds

    @property
    def source_dictionary(self):
        return self.vocab

    @property
    def target_dictionary(self):
        return self.vocab


@register_task("winogrande")
class WinograndeTask(WSCTask):
    """Reference wsc_task.py:267-375: exactly two candidates, one correct;
    sentences carry a ``_`` placeholder (wsc_utils.py:193-207)."""

    @classmethod
    def setup_task(cls, args, **kwargs):
        assert args.criterion == "winogrande", (
            "Must set --criterion=winogrande"
        )
        vocab = cls.load_dictionary(os.path.join(args.data, "dict.txt"))
        logger.info("dictionary: {} types".format(len(vocab)))
        return cls(args, vocab)

    def load_dataset(self, split, epoch=1, combine=False, data_path=None,
                     return_only=False, **kwargs):
        if data_path is None:
            data_path = os.path.join(self.args.data, split + ".jsonl")
        if not os.path.exists(data_path):
            raise FileNotFoundError("Cannot find data: {}".format(data_path))

        queries, query_masks, cands, cand_masks, labels, sizes = (
            [], [], [], [], [], []
        )
        is_eval = split == "test"
        with open(data_path) as fin:
            for line in fin:
                sample = json.loads(line.strip())
                sentence = sample["sentence"]
                option1, option2 = sample["option1"], sample["option2"]
                cut = sentence.index("_")
                prefix = sentence[:cut].rstrip()
                suffix = sentence[cut + 1:]
                lead = " " if sentence[:cut].endswith(" ") else ""
                if is_eval:
                    query, cand = option1, option2
                else:
                    query = option1 if sample["answer"] == "1" else option2
                    cand = option2 if sample["answer"] == "1" else option1
                q_toks, q_mask = self.binarize_with_mask(
                    query, prefix, suffix, lead, ""
                )
                c_toks, c_mask = self.binarize_with_mask(
                    cand, prefix, suffix, lead, ""
                )
                queries.append(q_toks)
                query_masks.append(q_mask)
                cands.append([c_toks])
                cand_masks.append([c_mask])
                # training queries are correct by construction
                labels.append(None if is_eval else True)
                sizes.append(len(q_toks))

        ds = WSCLikeDataset(
            queries, query_masks, cands, cand_masks, labels,
            self.vocab.pad(), sizes, shuffle=not return_only,
        )
        if return_only:
            return ds
        self.datasets[split] = ds
        return ds


@register_task("commonsense_qa")
class CommonsenseQATask(Task):
    """Reference commonsense_qa_task.py:28-174: reuses the
    sentence_ranking criterion + 1-output classification head over
    ``Q: <stem> </s> A: <choice>`` concatenations."""

    @staticmethod
    def add_args(parser):
        parser.add_argument("data", metavar="DIR",
                            help="path to data directory; loads <split>.jsonl")
        parser.add_argument("--init-token", type=int, default=None)
        parser.add_argument("--num-classes", type=int, default=5)

    def __init__(self, args, vocab):
        super().__init__(args)
        self.vocab = vocab
        self.mask = vocab.add_symbol("<mask>")
        from ..data.encoders import build_bpe

        self.bpe = build_bpe(args)

    @classmethod
    def load_dictionary(cls, filename):
        d = Dictionary.load(filename)
        d.add_symbol("<mask>")
        return d

    @classmethod
    def setup_task(cls, args, **kwargs):
        assert args.criterion == "sentence_ranking", (
            "Must set --criterion=sentence_ranking"
        )
        vocab = cls.load_dictionary(os.path.join(args.data, "dict.txt"))
        logger.info("dictionary: {} types".format(len(vocab)))
        return cls(args, vocab)

    def _binarize(self, s, append_bos=False):
        if self.bpe is not None:
            s = self.bpe.encode(s)
        tokens = self.vocab.encode_line(
            s, append_eos=True, add_if_not_exist=False
        ).astype(np.int64)
        if append_bos and getattr(self.args, "init_token", None) is not None:
            tokens = np.concatenate([[self.args.init_token], tokens])
        return tokens

    def load_dataset(self, split, epoch=1, combine=False, data_path=None,
                     return_only=False, **kwargs):
        from .sentence_ranking import SentenceRankingDataset

        if data_path is None:
            data_path = os.path.join(self.args.data, split + ".jsonl")
        if not os.path.exists(data_path):
            raise FileNotFoundError("Cannot find data: {}".format(data_path))

        options = [[] for _ in range(self.args.num_classes)]
        labels = []
        with open(data_path) as fin:
            for line in fin:
                example = json.loads(line.strip())
                if "answerKey" in example:
                    labels.append(ord(example["answerKey"]) - ord("A"))
                question = "Q: " + example["question"]["stem"]
                q_toks = self._binarize(question, append_bos=True)
                choices = example["question"]["choices"]
                assert len(choices) == self.args.num_classes
                for i, choice in enumerate(choices):
                    options[i].append(
                        np.concatenate(
                            [q_toks, self._binarize("A: " + choice["text"])]
                        )
                    )

        class _List:
            def __init__(self, items):
                self.items = items
                self.sizes = np.array([len(x) for x in items], np.int64)

            def __getitem__(self, i):
                return self.items[i]

            def __len__(self):
                return len(self.items)

        ds = SentenceRankingDataset(
            [_List(o) for o in options],
            labels if labels else None,
            self.vocab.pad(),
            shuffle=not return_only,
        )
        if return_only:
            return ds
        self.datasets[split] = ds
        logger.info("Loaded {} with {} samples".format(split, len(ds)))
        return ds

    def build_model(self, args):
        from ..registry import build_model

        model = build_model(args, self)
        model.register_classification_head(
            "sentence_classification_head", num_classes=1
        )
        return model

    @property
    def source_dictionary(self):
        return self.vocab

    @property
    def target_dictionary(self):
        return self.vocab
