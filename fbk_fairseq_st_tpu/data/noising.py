"""Word-level noising for denoising/unsupervised-MT training.

Counterpart of the reference fairseq/data/noising.py (WordNoising,
WordDropout, WordShuffle, UnsupervisedMTNoising, NoisingDataset) and
fairseq/data/backtranslation_dataset.py. Host-side NumPy — noising happens
in the data pipeline before fixed-shape padding, so the device program only
ever sees static shapes.

Design differences vs the reference: items are 1-D ``(T,)`` arrays (the
reference threads a T×B torch layout through per-sentence python loops —
reference noising.py:34-141); the per-sentence word logic is vectorized
NumPy. Semantics preserved: BPE-aware word grouping via a dictionary-wide
``bpe_end`` table, whole-word dropout/blank, EOS never dropped/moved,
shuffle displaces each word by < ``max_shuffle_distance`` positions, and
each item is noised under ``seed + index`` so epochs are reproducible.
"""

from __future__ import annotations

import numpy as np

from .datasets import Dataset


class WordNoising:
    """Base: map BPE token positions to word ids (reference noising.py:12-65)."""

    def __init__(self, dictionary, bpe_cont_marker="@@", bpe_end_marker=None):
        self.dictionary = dictionary
        self.bpe_end = None
        if bpe_cont_marker:
            self.bpe_end = np.array(
                [
                    not dictionary[i].endswith(bpe_cont_marker)
                    for i in range(len(dictionary))
                ]
            )
        elif bpe_end_marker:
            self.bpe_end = np.array(
                [
                    dictionary[i].endswith(bpe_end_marker)
                    for i in range(len(dictionary))
                ]
            )

    def word_ids(self, x: np.ndarray) -> np.ndarray:
        """x: (T,) token ids -> (T,) word index each token belongs to.

        ["how", "are", "y@@", "ou"] -> [0, 1, 2, 2] (a continuation token
        shares the id of the word it continues).
        """
        x = np.asarray(x)
        if self.bpe_end is None:
            return np.arange(len(x))
        end = self.bpe_end[x]
        # word id = number of word-ends strictly before this position
        # (suffix-sum formulation of reference noising.py:53-56)
        return np.concatenate([[0], np.cumsum(end[:-1])])

    def noising(self, x, rng):
        raise NotImplementedError


class WordDropout(WordNoising):
    """Drop (or blank) whole words (reference noising.py:68-141)."""

    def __init__(self, dictionary, default_dropout_prob=0.1,
                 bpe_cont_marker="@@", bpe_end_marker=None):
        super().__init__(dictionary, bpe_cont_marker, bpe_end_marker)
        self.default_dropout_prob = default_dropout_prob

    def noising(self, x, rng, dropout_prob=None, blank_idx=None):
        if dropout_prob is None:
            dropout_prob = self.default_dropout_prob
        if dropout_prob == 0:
            return np.asarray(x)
        assert 0 < dropout_prob < 1
        x = np.asarray(x)
        word_idx = self.word_ids(x)
        num_words = int(word_idx[-1]) + 1 if len(x) else 0
        if num_words == 0:
            return x

        has_eos = len(x) > 0 and x[-1] == self.dictionary.eos()
        if has_eos:
            keep_words = rng.rand(num_words - 1) >= dropout_prob
            keep_words = np.append(keep_words, True)  # never drop EOS
        else:
            keep_words = rng.rand(num_words) >= dropout_prob

        keep = keep_words[word_idx]
        if blank_idx is not None:
            out = np.where(keep, x, blank_idx)
        else:
            out = x[keep]
        # keep at least one real token besides EOS (reference :122-125)
        if len(out) <= 1:
            out = np.concatenate([[x[rng.randint(0, len(x))]], out])
        return out.astype(x.dtype)


class WordShuffle(WordNoising):
    """Displace each word by < k positions (reference noising.py:144-184)."""

    def __init__(self, dictionary, default_max_shuffle_distance=3,
                 bpe_cont_marker="@@", bpe_end_marker=None):
        super().__init__(dictionary, bpe_cont_marker, bpe_end_marker)
        self.default_max_shuffle_distance = default_max_shuffle_distance

    def noising(self, x, rng, max_shuffle_distance=None):
        if max_shuffle_distance is None:
            max_shuffle_distance = self.default_max_shuffle_distance
        if max_shuffle_distance == 0:
            return np.asarray(x)
        assert max_shuffle_distance > 1
        x = np.asarray(x)
        length = len(x)
        if x[-1] == self.dictionary.eos():
            length -= 1  # EOS stays at the end
        if length <= 1:
            return x
        word_idx = self.word_ids(x)[:length]
        noise = rng.uniform(0, max_shuffle_distance, size=length)
        noise[0] = -1  # keep a leading BOS in place (reference :167)
        # sort words by (word id + per-word noise); the epsilon ramp keeps
        # tokens inside a word in order (reference :176-179)
        scores = word_idx + noise[word_idx] + 1e-6 * np.arange(length)
        perm = np.argsort(scores, kind="stable")
        out = x.copy()
        out[:length] = x[:length][perm]
        return out


class UnsupervisedMTNoising(WordNoising):
    """shuffle -> dropout -> blank-with-unk (reference noising.py:187-238)."""

    def __init__(self, dictionary, max_word_shuffle_distance,
                 word_dropout_prob, word_blanking_prob,
                 bpe_cont_marker="@@", bpe_end_marker=None):
        super().__init__(dictionary)
        self.max_word_shuffle_distance = max_word_shuffle_distance
        self.word_dropout_prob = word_dropout_prob
        self.word_blanking_prob = word_blanking_prob
        self.word_dropout = WordDropout(
            dictionary, bpe_cont_marker=bpe_cont_marker,
            bpe_end_marker=bpe_end_marker)
        self.word_shuffle = WordShuffle(
            dictionary, bpe_cont_marker=bpe_cont_marker,
            bpe_end_marker=bpe_end_marker)

    def noising(self, x, rng):
        x = self.word_shuffle.noising(
            x, rng, max_shuffle_distance=self.max_word_shuffle_distance)
        x = self.word_dropout.noising(
            x, rng, dropout_prob=self.word_dropout_prob)
        x = self.word_dropout.noising(
            x, rng, dropout_prob=self.word_blanking_prob,
            blank_idx=self.dictionary.unk())
        return x


class NoisingDataset(Dataset):
    """Apply a noiser to every item under seed+index (reference
    noising.py:241-315)."""

    def __init__(self, src_dataset, src_dict, seed, noiser=None,
                 noising_class=UnsupervisedMTNoising, **kwargs):
        self.src_dataset = src_dataset
        self.src_dict = src_dict
        self.seed = seed
        self.noiser = (
            noiser if noiser is not None
            else noising_class(dictionary=src_dict, **kwargs)
        )

    def __getitem__(self, index):
        rng = np.random.RandomState(
            (self.seed + index) % (2 ** 32)
        )
        return self.noiser.noising(np.asarray(self.src_dataset[index]), rng)

    def __len__(self):
        return len(self.src_dataset)

    def num_tokens(self, index):
        return self.src_dataset.num_tokens(index)

    def size(self, index):
        return self.src_dataset.size(index)

    @property
    def sizes(self):
        return self.src_dataset.sizes

    def ordered_indices(self):
        return self.src_dataset.ordered_indices()


def backtranslate_samples(samples, collate_fn, generate_fn):
    """Collate tgt-side samples, generate sources with the reverse model, and
    return {generated source, original source-as-target} pairs (reference
    backtranslation_dataset.py:13-49)."""
    collated = collate_fn(samples)
    generated = generate_fn(collated)
    id_to_src = {s["id"]: s["source"] for s in samples}
    out = []
    for sample_id, hypos in zip(np.asarray(collated["id"]), generated):
        sample_id = int(sample_id)
        if sample_id < 0 or not hypos:  # fixed-shape batch padding rows
            continue
        out.append(
            {
                "id": sample_id,
                "target": id_to_src[sample_id],
                "source": np.asarray(hypos[0]["tokens"]),
            }
        )
    return out


class BacktranslationDataset(Dataset):
    """Generate the source side of each batch with a reverse-direction model
    at collate time (reference backtranslation_dataset.py:52-165).

    ``backtranslation_fn(collated_batch) -> hypos`` is typically a bound
    ``SequenceGenerator.generate``; set it after model build via
    :meth:`set_backtranslation_fn`.
    """

    def __init__(self, tgt_dataset, src_dict, tgt_dict=None,
                 backtranslation_fn=None, output_collater=None, **kwargs):
        self.tgt_dataset = tgt_dataset
        self.backtranslation_fn = backtranslation_fn
        self.output_collater = (
            output_collater if output_collater is not None
            else tgt_dataset.collater
        )
        self.src_dict = src_dict
        self.tgt_dict = tgt_dict

    def set_backtranslation_fn(self, backtranslation_fn):
        self.backtranslation_fn = backtranslation_fn

    def __getitem__(self, index):
        return self.tgt_dataset[index]

    def __len__(self):
        return len(self.tgt_dataset)

    def collater(self, samples, **kwargs):
        if not samples:
            return {}
        assert self.backtranslation_fn is not None, (
            "set_backtranslation_fn must be called before batching"
        )
        samples = backtranslate_samples(
            samples,
            collate_fn=self.tgt_dataset.collater,
            generate_fn=self.backtranslation_fn,
        )
        return self.output_collater(samples, **kwargs)

    def num_tokens(self, index):
        return self.tgt_dataset.num_tokens(index)

    def ordered_indices(self):
        return self.tgt_dataset.ordered_indices()

    def size(self, index):
        # src length unknown until generation; approximate with tgt length
        # (reference backtranslation_dataset.py:149-158)
        tgt_size = self.tgt_dataset.size(index)
        if isinstance(tgt_size, tuple):
            tgt_size = tgt_size[0]
        return (tgt_size, tgt_size)

    @property
    def sizes(self):
        return self.tgt_dataset.sizes
