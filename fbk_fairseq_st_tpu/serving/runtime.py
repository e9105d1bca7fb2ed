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
        import jax

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
        # place weights on device ONCE: passing host numpy to every call
        # would re-transfer the full parameter set per request
        variables_list = jax.device_put(variables_list)
        tgt_dict = cls._load_dict(path, meta, "tgt")
        if tgt_dict is None:
            raise ValueError(
                f"{path}: meta.json lacks dictionary metadata — re-export "
                "the artifact with this version"
            )
        src_dict = cls._load_dict(path, meta, "src")
        return cls(path, meta, variables_list, tgt_dict, src_dict)

    @staticmethod
    def _load_dict(path: str, meta: dict, name: str) -> Optional[Dictionary]:
        """Rebuild a dictionary with its special rows intact. The text
        format stores only non-special symbols, so the specials (incl.
        subclass extras like '<mask>') come from meta — otherwise every
        id would shift vs the embedding matrix baked into the program."""
        row = (meta.get("dicts") or {}).get(name)
        if row is None:
            return None
        d = Dictionary(
            pad=row["pad"], eos=row["eos"], unk=row["unk"], bos=row["bos"],
            extra_special_symbols=row.get("extra_specials") or None,
        )
        d.add_from_file(os.path.join(path, row["file"]))
        if len(d) != row["size"]:
            raise ValueError(
                f"{name} dictionary reloaded to {len(d)} entries, exported "
                f"with {row['size']} — the artifact is corrupt or the "
                "dictionary class used custom serialization"
            )
        return d

    def _program(self, name: str):
        if name not in self._programs:
            import jax
            from jax import export as jax_export

            row = next(r for r in self._buckets if r["name"] == name)
            with open(os.path.join(self.root, row["file"]), "rb") as f:
                exported = jax_export.deserialize(f.read())
            # jit the call ONCE per program: a bare Exported.call builds a
            # fresh traced computation every invocation
            self._programs[name] = jax.jit(exported.call)
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
            if x.shape[0] == 0:
                # a zero length would make the encoder mask all-True —
                # softmax over all -inf, NaN served as a valid-looking hypo
                raise ValueError(f"input {i} is empty")
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
            self._program(row["name"])(self.variables_list, src, lengths)
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

    def translate_many(self, inputs: Sequence[np.ndarray], nbest: int = 1,
                       detokenize: bool = True) -> List[List[dict]]:
        """translate() for arbitrarily many inputs: greedily packs maximal
        chunks that some bucket fits (chunk width adapts to the chunk's
        longest input, so a wide-but-short bucket never blocks a
        narrow-but-long one)."""
        inputs = [np.asarray(x) for x in inputs]
        out: List[List[dict]] = []
        i = 0
        widest = max(r["batch"] for r in self._buckets)
        while i < len(inputs):
            take = min(widest, len(inputs) - i)
            while take > 1:
                longest = max(x.shape[0] for x in inputs[i:i + take])
                if any(
                    r["batch"] >= take and r["src_len"] >= longest
                    for r in self._buckets
                ):
                    break
                take -= 1
            # take == 1 falls through to translate(), which raises the
            # no-fitting-bucket error if even a single input is too long
            out.extend(self.translate(inputs[i:i + take], nbest, detokenize))
            i += take
        return out

    def warmup(self) -> None:
        """Execute every program once so first requests are served at
        steady-state latency. Calls each program directly — bucket
        dispatch would always route the probe to the smallest fitting
        bucket and could leave others cold."""
        import jax

        for row in self._buckets:
            src = np.zeros(
                (row["batch"], row["src_len"]) + self._src_suffix,
                self._src_dtype,
            )
            if self.src_kind != "audio":
                src.fill(self.meta["eos"])
            lengths = np.full((row["batch"],), row["src_len"], np.int32)
            jax.block_until_ready(
                self._program(row["name"])(
                    self.variables_list, src, lengths
                )
            )
