"""Model-code-free serving runtime for exported decode artifacts.

Loads what ``serving.export.export_artifact`` wrote and serves requests
with NO model reconstruction: no registry lookup, no architecture class,
no checkpoint args — the decode program is already compiled (StableHLO)
and only ``jax.export.deserialize`` + the dictionary file are needed.
This is the property the reference gets from TorchScript (a scripted
SequenceGenerator runs without the defining Python module); here it also
pins the exact XLA program, so serving never recompiles and cannot drift
from what was validated at export time.

Requests are padded up to the smallest fitting (batch, src_len) bucket —
static shapes end-to-end, the TPU serving contract.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..data.dictionary import Dictionary
from ..generation.postprocess import collect_hypotheses
from .export import FORMAT_NAME, unflatten_variables


class ServingModel:
    """An exported artifact, ready to decode.

    >>> sm = ServingModel.load("exported/")
    >>> hypos = sm.translate([feature_matrix_or_token_ids, ...])
    >>> hypos[0][0]["text"], hypos[0][0]["score"]
    """

    def __init__(self, root: str, meta: dict, variables_list: List[dict],
                 tgt_dict: Dictionary, src_dict: Optional[Dictionary]):
        self.root = root
        self.meta = meta
        self.variables_list = variables_list
        self.tgt_dict = tgt_dict
        self.src_dict = src_dict
        self.beam_size = int(meta["beam_size"])
        self.pad = int(meta["pad"])
        self.src_kind = meta["src"]["kind"]
        self._src_dtype = np.dtype(meta["src"]["dtype"])
        self._src_suffix = tuple(meta["src"].get("suffix", ()))
        self._programs: Dict[str, object] = {}
        self._buckets = sorted(
            meta["programs"], key=lambda r: (r["batch"], r["src_len"])
        )

    # ------------------------------------------------------------------
    # loading
    # ------------------------------------------------------------------

    @classmethod
    def load(cls, path: str) -> "ServingModel":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        if meta.get("format") != FORMAT_NAME:
            raise ValueError(
                f"{path}: not a {FORMAT_NAME} artifact (format="
                f"{meta.get('format')!r})"
            )
        variables_list = []
        for row in meta["weights"]:
            with np.load(os.path.join(path, row["file"])) as z:
                flat = {k: z[k] for k in z.files}
            variables_list.append(
                unflatten_variables(flat, row.get("structure"))
            )
        tgt_dict = Dictionary.load(os.path.join(path, "dict.tgt.txt"))
        src_path = os.path.join(path, "dict.src.txt")
        src_dict = Dictionary.load(src_path) if os.path.exists(src_path) else None
        return cls(path, meta, variables_list, tgt_dict, src_dict)

    def _program(self, name: str):
        if name not in self._programs:
            from jax import export as jax_export

            row = next(r for r in self._buckets if r["name"] == name)
            with open(os.path.join(self.root, row["file"]), "rb") as f:
                self._programs[name] = jax_export.deserialize(f.read())
        return self._programs[name]

    # ------------------------------------------------------------------
    # bucket dispatch
    # ------------------------------------------------------------------

    def _pick_bucket(self, n: int, max_src: int) -> dict:
        for row in self._buckets:  # sorted: smallest fitting wins
            if row["batch"] >= n and row["src_len"] >= max_src:
                return row
        raise ValueError(
            f"no exported bucket fits batch={n}, src_len={max_src}; "
            f"available: {[(r['batch'], r['src_len']) for r in self._buckets]}"
            " — split the request or re-export with larger buckets"
        )

    def _pad_batch(self, inputs: Sequence[np.ndarray], row: dict):
        B, S = row["batch"], row["src_len"]
        if self.src_kind == "audio":
            pad_value = 0.0
        else:
            pad_value = self.pad
        src = np.full((B, S) + self._src_suffix, pad_value, self._src_dtype)
        # padding rows get length 1 (a real zero-length row would make the
        # encoder's mask all-True); their outputs are dropped
        lengths = np.ones((B,), np.int32)
        for i, x in enumerate(inputs):
            x = np.asarray(x, self._src_dtype)
            if x.shape[1:] != self._src_suffix:
                raise ValueError(
                    f"input {i}: trailing shape {x.shape[1:]} != exported "
                    f"{self._src_suffix}"
                )
            src[i, : x.shape[0]] = x
            lengths[i] = x.shape[0]
        return src, lengths

    # ------------------------------------------------------------------
    # decoding
    # ------------------------------------------------------------------

    def translate(self, inputs: Sequence[np.ndarray], nbest: int = 1,
                  detokenize: bool = True) -> List[List[dict]]:
        """inputs: per request, a (frames, feat) float matrix (audio
        artifacts) or a 1-D int token-id array incl. eos (text artifacts).
        Returns per input up to ``nbest`` hypo dicts ({tokens, score,
        positional_scores} + "text" when detokenize)."""
        import jax

        if nbest > self.beam_size:
            raise ValueError(
                f"nbest={nbest} > exported beam_size={self.beam_size}"
            )
        inputs = [np.asarray(x) for x in inputs]
        if not inputs:
            return []
        row = self._pick_bucket(len(inputs), max(x.shape[0] for x in inputs))
        src, lengths = self._pad_batch(inputs, row)
        fin = jax.device_get(
            self._program(row["name"]).call(self.variables_list, src, lengths)
        )
        hypos = collect_hypotheses(fin, len(inputs), self.beam_size)
        out = []
        for sent in hypos:
            sent = sent[:nbest]
            if detokenize:
                for h in sent:
                    h["text"] = self.tgt_dict.string(
                        h["tokens"], self.meta.get("remove_bpe")
                    )
            out.append(sent)
        return out

    def encode_source(self, line: str) -> np.ndarray:
        """Whitespace-tokenize a raw source line with the shipped source
        dictionary (text artifacts; cli/interactive.py contract)."""
        if self.src_dict is None:
            raise ValueError(
                "artifact has no source dictionary (audio input?)"
            )
        return np.asarray(
            self.src_dict.encode_line(line, add_if_not_exist=False),
            np.int32,
        )

    def warmup(self) -> None:
        """Execute every bucket once (compile/load) so first requests are
        served at steady-state latency."""
        for row in self._buckets:
            if self.src_kind == "audio":
                x = np.zeros((row["src_len"],) + self._src_suffix,
                             self._src_dtype)
            else:
                x = np.full((row["src_len"],), self.meta["eos"],
                            self._src_dtype)
            self.translate([x], nbest=1, detokenize=False)
