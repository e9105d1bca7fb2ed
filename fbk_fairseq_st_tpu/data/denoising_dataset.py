"""BART-style denoising dataset.

Counterpart of fairseq/data/denoising_dataset.py:93-387: per-item seeded
(seed, epoch, index) noising — sentence permutation, whole-word/span-poisson
masking with replace-length semantics, token insertion, rolling — producing
(noised source, original target) pairs for sequence-to-sequence denoising
pretraining. Host-side NumPy (the noise runs in the data pipeline; the TPU
program sees fixed-shape collated batches)."""

from __future__ import annotations

import math

import numpy as np

from .datasets import Dataset, collate_tokens


class DenoisingDataset(Dataset):
    def __init__(self, dataset, sizes, vocab, mask_idx, mask_whole_words,
                 shuffle, seed, args, eos=None):
        self.dataset = dataset
        self._sizes = np.asarray(sizes)
        self.vocab = vocab
        self.shuffle = shuffle
        self.seed = seed
        self.mask_idx = mask_idx
        self.mask_whole_word = mask_whole_words
        self.mask_ratio = args.mask
        self.random_ratio = args.mask_random
        self.insert_ratio = args.insert
        self.rotate_ratio = args.rotate
        self.permute_sentence_ratio = args.permute_sentences
        self.eos = eos if eos is not None else vocab.eos()
        if getattr(args, "bpe", None) != "gpt2":
            self.full_stop_index = self.vocab.eos()
        else:
            self.full_stop_index = self.vocab.index("13")
        self.replace_length = args.replace_length
        assert self.replace_length in (-1, 0, 1)
        assert args.mask_length in ("subword", "word", "span-poisson")
        if args.mask_length == "subword" and self.replace_length not in (0, 1):
            raise ValueError("if using subwords, use replace-length=1 or 0")

        self.span_ps = None
        if args.mask_length == "span-poisson":
            # truncated Poisson(lambda) pmf (reference :136-150)
            lam = args.poisson_lambda
            lam_k, e_lam, k_fact = 1.0, math.exp(-lam), 1.0
            ps = []
            for k in range(0, 128):
                ps.append(e_lam * lam_k / k_fact)
                lam_k *= lam
                k_fact *= k + 1
                if ps[-1] < 1e-7:
                    break
            ps = np.array(ps)
            self.span_ps = ps / ps.sum()
        self.epoch = 0

    def set_epoch(self, epoch, **unused):
        self.epoch = epoch

    def __getitem__(self, index):
        rng = np.random.RandomState(
            np.random.RandomState([self.seed, self.epoch, index]).randint(
                2 ** 31
            )
        )
        tokens = np.asarray(self.dataset[index], np.int64)
        assert tokens[-1] == self.eos
        source, target = tokens.copy(), tokens.copy()

        if self.permute_sentence_ratio > 0.0:
            source = self.permute_sentences(
                source, rng, self.permute_sentence_ratio
            )
        if self.mask_ratio > 0:
            source = self.add_whole_word_mask(source, rng, self.mask_ratio)
        if self.insert_ratio > 0:
            source = self.add_insertion_noise(source, rng, self.insert_ratio)
        if self.rotate_ratio > 0.0 and rng.random_sample() < self.rotate_ratio:
            source = self.add_rolling_noise(source, rng)

        assert (source >= 0).all()
        assert source[0] == self.vocab.bos()
        assert source[-1] == self.eos
        return {"id": index, "source": source, "target": target}

    # -- noise ops (reference :189-346) ---------------------------------------

    def permute_sentences(self, source, rng, p=1.0):
        full_stops = source == self.full_stop_index
        full_stops[-2] = True
        sentence_ends = (
            np.nonzero(full_stops[1:] & ~full_stops[:-1])[0] + 2
        )
        result = source.copy()
        num_sentences = len(sentence_ends)
        if num_sentences == 0:
            return result
        num_to_permute = math.ceil((num_sentences * 2 * p) / 2.0)
        substitutions = rng.permutation(num_sentences)[:num_to_permute]
        ordering = np.arange(num_sentences)
        ordering[substitutions] = substitutions[
            rng.permutation(num_to_permute)
        ]
        index = 1
        for i in ordering:
            start = sentence_ends[i - 1] if i > 0 else 1
            sentence = source[start: sentence_ends[i]]
            result[index: index + len(sentence)] = sentence
            index += len(sentence)
        return result

    def word_starts(self, source):
        if self.mask_whole_word is not None:
            is_word_start = self.mask_whole_word[source].astype(np.int64)
        else:
            is_word_start = np.ones(len(source), np.int64)
        is_word_start[0] = 0
        is_word_start[-1] = 0
        return is_word_start

    def _fill_mask(self, source, indices, mask_random, rng):
        source[indices] = self.mask_idx
        if mask_random.any():
            source[indices[mask_random]] = rng.randint(
                1, len(self.vocab), size=int(mask_random.sum())
            )

    def add_whole_word_mask(self, source, rng, p):
        is_word_start = self.word_starts(source)
        num_to_mask = int(math.ceil(is_word_start.sum() * p))
        num_inserts = 0
        if num_to_mask == 0:
            return source

        if self.span_ps is not None:
            lengths = rng.choice(
                len(self.span_ps), size=num_to_mask, p=self.span_ps
            )
            cum = np.cumsum(lengths)
            while cum[-1] < num_to_mask:
                more = rng.choice(
                    len(self.span_ps), size=num_to_mask, p=self.span_ps
                )
                lengths = np.concatenate([lengths, more])
                cum = np.cumsum(lengths)
            i = int(np.searchsorted(cum, num_to_mask))
            lengths[i] = num_to_mask - (0 if i == 0 else cum[i - 1])
            num_to_mask = i + 1
            lengths = lengths[:num_to_mask]
            lengths = lengths[lengths > 0]
            num_inserts = num_to_mask - len(lengths)
            num_to_mask -= num_inserts
            if num_to_mask == 0:
                return self.add_insertion_noise(
                    source, rng, num_inserts / len(source)
                )
        else:
            lengths = np.ones(num_to_mask, np.int64)

        word_starts = np.nonzero(is_word_start)[0]
        indices = word_starts[rng.permutation(len(word_starts))[:num_to_mask]]
        mask_random = rng.uniform(size=num_to_mask) < self.random_ratio

        source = source.copy()
        source_length = len(source)
        to_keep = np.ones(source_length, bool)
        is_word_start = is_word_start.copy()
        is_word_start[-1] = 255  # spans never run past the end
        if self.replace_length == 0:
            to_keep[indices] = False
        else:
            self._fill_mask(source, indices, mask_random, rng)

        if self.span_ps is not None:
            lengths = lengths - 1
            while len(indices) > 0:
                lengths = lengths - is_word_start[indices + 1]
                uncompleted = lengths >= 0
                indices = indices[uncompleted] + 1
                mask_random = mask_random[uncompleted]
                lengths = lengths[uncompleted]
                if self.replace_length != -1:
                    to_keep[indices] = False
                else:
                    self._fill_mask(source, indices, mask_random, rng)
        else:
            while len(indices) > 0:
                uncompleted = is_word_start[indices + 1] == 0
                indices = indices[uncompleted] + 1
                mask_random = mask_random[uncompleted]
                if self.replace_length != -1:
                    to_keep[indices] = False
                else:
                    self._fill_mask(source, indices, mask_random, rng)

        source = source[to_keep]
        if num_inserts > 0:
            source = self.add_insertion_noise(
                source, rng, num_inserts / len(source)
            )
        return source

    def add_permuted_noise(self, tokens, rng, p):
        num_words = len(tokens)
        num_to_permute = math.ceil(((num_words * 2) * p) / 2.0)
        substitutions = rng.permutation(num_words - 2)[:num_to_permute] + 1
        tokens = tokens.copy()
        tokens[substitutions] = tokens[
            substitutions[rng.permutation(num_to_permute)]
        ]
        return tokens

    def add_rolling_noise(self, tokens, rng):
        offset = rng.randint(1, max(1, len(tokens) - 1) + 1)
        return np.concatenate(
            [tokens[0:1], tokens[offset:-1], tokens[1:offset], tokens[-1:]]
        )

    def add_insertion_noise(self, tokens, rng, p):
        if p == 0.0:
            return tokens
        num_tokens = len(tokens)
        n = int(math.ceil(num_tokens * p))
        noise_indices = rng.permutation(num_tokens + n - 2)[:n] + 1
        noise_mask = np.zeros(num_tokens + n, bool)
        noise_mask[noise_indices] = True
        result = np.full(n + num_tokens, -1, np.int64)
        num_random = int(math.ceil(n * self.random_ratio))
        result[noise_indices[num_random:]] = self.mask_idx
        result[noise_indices[:num_random]] = rng.randint(
            1, len(self.vocab), size=num_random
        )
        result[~noise_mask] = tokens
        assert (result >= 0).all()
        return result

    # -- batching ---------------------------------------------------------------

    def collater(self, samples, pad_to_src_len=None, pad_to_tgt_len=None,
                 pad_to_bsz=None):
        if len(samples) == 0:
            return {}
        pad = self.vocab.pad()
        eos = self.eos
        ids = np.array([s["id"] for s in samples], np.int64)
        src = collate_tokens(
            [s["source"] for s in samples], pad, eos,
            pad_to_length=pad_to_src_len,
        )
        src_lengths = np.array([len(s["source"]) for s in samples], np.int64)
        order = np.argsort(-src_lengths, kind="stable")
        tgt = collate_tokens(
            [s["target"] for s in samples], pad, eos,
            pad_to_length=pad_to_tgt_len,
        )
        prev = collate_tokens(
            [s["target"] for s in samples], pad, eos,
            move_eos_to_beginning=True, pad_to_length=pad_to_tgt_len,
        )
        ids, src, src_lengths = ids[order], src[order], src_lengths[order]
        tgt, prev = tgt[order], prev[order]
        nsentences = len(samples)
        ntokens = int(sum(len(s["target"]) for s in samples))
        if pad_to_bsz is not None and pad_to_bsz > nsentences:
            extra = pad_to_bsz - nsentences
            ids = np.concatenate([ids, np.full(extra, -1, np.int64)])
            src = np.concatenate(
                [src, np.full((extra, src.shape[1]), pad, src.dtype)]
            )
            src_lengths = np.concatenate(
                [src_lengths, np.zeros(extra, np.int64)]
            )
            tgt = np.concatenate(
                [tgt, np.full((extra, tgt.shape[1]), pad, tgt.dtype)]
            )
            prev = np.concatenate(
                [prev, np.full((extra, prev.shape[1]), pad, prev.dtype)]
            )
        return {
            "id": ids,
            "nsentences": nsentences,
            "ntokens": ntokens,
            "net_input": {
                "src_tokens": src,
                "src_lengths": src_lengths,
                "prev_output_tokens": prev,
            },
            "target": tgt,
        }

    def __len__(self):
        return len(self.dataset)

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
        return order[np.argsort(self._sizes[order], kind="mergesort")]
