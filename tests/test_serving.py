"""Serving export/runtime: jax.export artifact round-trips.

The property under test is the serving contract: an exported artifact
decodes IDENTICALLY to the live generator it was exported from, loads
with no model reconstruction (registry/arch code never invoked), pads
requests into static shape buckets, and serves over the HTTP front end.
Role-parity target: the reference's TorchScript-scripted
SequenceGenerator (fairseq/sequence_generator.py is @torch.jit.script
compatible) and ONNX export paths.
"""

import http.client
import json
import threading

import jax
import numpy as np
import pytest

from fbk_fairseq_st_tpu import registry
from fbk_fairseq_st_tpu.generation import SequenceGenerator
from fbk_fairseq_st_tpu.serving import ServingModel, export_artifact

from .utils import DummyTask, dummy_dictionary, model_args

TINY = dict(
    encoder_layers=1,
    decoder_layers=1,
    encoder_embed_dim=16,
    decoder_embed_dim=16,
    encoder_ffn_embed_dim=32,
    decoder_ffn_embed_dim=32,
    encoder_attention_heads=2,
    decoder_attention_heads=2,
    max_source_positions=64,
    max_target_positions=32,
)


def build_tiny_mt():
    d = dummy_dictionary(20)

    class T:
        source_dictionary = d
        target_dictionary = d

    args = model_args("transformer", **TINY)
    registry.apply_architecture(args)
    model = registry.build_model(args, T())
    variables = model.init(jax.random.PRNGKey(7))
    return d, model, variables


def mt_inputs(d, n, max_len=8):
    rng = np.random.RandomState(3)
    out = []
    for _ in range(n):
        L = rng.randint(3, max_len)
        toks = rng.randint(d.nspecial, len(d), size=L).astype(np.int32)
        toks[-1] = d.eos()
        out.append(toks)
    return out


def live_decode(generator, model, variables, inputs, src_len):
    """Reference decode through the live generator, batched at the same
    padded src_len the bucket uses (apples-to-apples)."""
    pad = generator.pad
    src = np.full((len(inputs), src_len), pad, np.int32)
    lengths = np.zeros((len(inputs),), np.int32)
    for i, x in enumerate(inputs):
        src[i, : len(x)] = x
        lengths[i] = len(x)
    sample = {"net_input": {"src_tokens": src, "src_lengths": lengths}}
    return generator.generate([(model, variables)], sample)


@pytest.fixture(scope="module")
def mt_artifact(tmp_path_factory):
    d, model, variables = build_tiny_mt()
    generator = SequenceGenerator(d, beam_size=3, max_len_b=10)
    out = str(tmp_path_factory.mktemp("serving") / "mt")
    meta = export_artifact(
        [(model, variables)],
        generator,
        [(2, 8), (4, 12)],
        out,
        tgt_dict=d,
        src_dict=d,
        src_spec={"kind": "tokens", "dtype": "int32"},
        platforms=("cpu",),
        provenance={"arch": "transformer"},
    )
    return d, model, variables, generator, out, meta


@pytest.mark.quick
def test_artifact_layout(mt_artifact):
    d, model, variables, generator, out, meta = mt_artifact
    import os

    assert os.path.exists(os.path.join(out, "meta.json"))
    assert os.path.exists(os.path.join(out, "dict.tgt.txt"))
    assert os.path.exists(os.path.join(out, "programs", "b2_s8.jexp"))
    assert os.path.exists(os.path.join(out, "weights", "model0.npz"))
    assert meta["beam_size"] == 3
    assert [
        (r["batch"], r["src_len"]) for r in meta["programs"]
    ] == [(2, 8), (4, 12)]


@pytest.mark.quick
def test_roundtrip_matches_live_generator(mt_artifact):
    d, model, variables, generator, out, _ = mt_artifact
    sm = ServingModel.load(out)
    inputs = mt_inputs(d, 2)
    got = sm.translate(inputs, nbest=3)
    want = live_decode(generator, model, variables, inputs, src_len=8)
    for g_sent, w_sent in zip(got, want):
        assert len(g_sent) == len(w_sent)
        for g, w in zip(g_sent, w_sent):
            np.testing.assert_array_equal(g["tokens"], w["tokens"])
            assert abs(g["score"] - w["score"]) < 1e-5
            np.testing.assert_allclose(
                g["positional_scores"], w["positional_scores"], atol=1e-5
            )


@pytest.mark.quick
def test_bucket_padding_rows_are_inert(mt_artifact):
    """3 requests dispatch to the 4-wide bucket; results must equal the
    2-wide bucket's decodes of the same sentences (pad rows change
    nothing, extra src padding is masked for MT)."""
    d, model, variables, generator, out, _ = mt_artifact
    sm = ServingModel.load(out)
    inputs = mt_inputs(d, 3)
    batched = sm.translate(inputs, nbest=1)
    single = [sm.translate([x], nbest=1)[0] for x in inputs[:2]]
    for got, want in zip(batched[:2], single):
        np.testing.assert_array_equal(got[0]["tokens"], want[0]["tokens"])
        assert abs(got[0]["score"] - want[0]["score"]) < 1e-5
    assert len(batched) == 3


@pytest.mark.quick
def test_loads_without_model_reconstruction(mt_artifact, monkeypatch):
    """The serving promise: no registry/arch code runs at load or decode
    time (the reference needs TorchScript for this property)."""
    d, model, variables, generator, out, _ = mt_artifact

    def boom(*a, **k):
        raise AssertionError("registry.build_model called by serving")

    monkeypatch.setattr(registry, "build_model", boom)
    monkeypatch.setattr(registry, "apply_architecture", boom)
    sm = ServingModel.load(out)
    res = sm.translate(mt_inputs(d, 1), nbest=1)
    assert res and res[0] and "text" in res[0][0]


@pytest.mark.quick
def test_detok_and_encode_source(mt_artifact):
    d, model, variables, generator, out, _ = mt_artifact
    sm = ServingModel.load(out)
    line = " ".join(d.symbols[d.nspecial : d.nspecial + 3])
    ids = sm.encode_source(line)
    assert ids[-1] == d.eos() and len(ids) == 4
    res = sm.translate([ids], nbest=2)
    assert len(res[0]) == 2
    # text detokenizes through the shipped dict
    for h in res[0]:
        assert h["text"] == d.string(h["tokens"], None)


@pytest.mark.quick
def test_no_fitting_bucket_raises(mt_artifact):
    d, model, variables, generator, out, _ = mt_artifact
    sm = ServingModel.load(out)
    with pytest.raises(ValueError, match="no exported bucket"):
        sm.translate(mt_inputs(d, 5))  # widest bucket is 4
    with pytest.raises(ValueError, match="no exported bucket"):
        long = np.full((20,), d.eos(), np.int32)
        sm.translate([long])  # longest bucket is 12
    with pytest.raises(ValueError, match="empty"):
        sm.translate([np.zeros((0,), np.int32)])


@pytest.mark.quick
def test_translate_many_chunks_and_warmup(mt_artifact):
    d, model, variables, generator, out, _ = mt_artifact
    sm = ServingModel.load(out)
    # 5 inputs > widest bucket (4): chunked 4 + 1, same results as one-by-one
    inputs = mt_inputs(d, 5)
    many = sm.translate_many(inputs, nbest=1)
    assert len(many) == 5
    for got, x in zip(many, inputs):
        want = sm.translate([x], nbest=1)[0]
        np.testing.assert_array_equal(got[0]["tokens"], want[0]["tokens"])
    # warmup executes (and caches) EVERY program, not just the smallest
    # fitting one
    sm2 = ServingModel.load(out)
    sm2.warmup()
    assert set(sm2._programs) == {r["name"] for r in sm2.meta["programs"]}


def test_translate_many_adapts_chunk_width(tmp_path):
    """Buckets (4, 8) and (2, 12): four length-10 inputs can never use the
    4-wide bucket — chunking must narrow to 2 instead of failing."""
    d, model, variables = build_tiny_mt()
    generator = SequenceGenerator(d, beam_size=2, max_len_b=8)
    out = str(tmp_path / "mixed")
    export_artifact(
        [(model, variables)], generator, [(4, 8), (2, 12)], out,
        tgt_dict=d, src_dict=d, platforms=("cpu",),
    )
    sm = ServingModel.load(out)
    rng = np.random.RandomState(0)
    inputs = []
    for _ in range(4):
        x = rng.randint(d.nspecial, len(d), size=10).astype(np.int32)
        x[-1] = d.eos()
        inputs.append(x)
    res = sm.translate_many(inputs, nbest=1)
    assert len(res) == 4 and all(r for r in res)


def test_dictionary_extra_specials_roundtrip(tmp_path):
    """Dictionaries with extra special symbols (MaskedLMDictionary-style
    '<mask>' at id 4) must reload with identical ids: the text format
    drops special rows, so meta carries them."""
    from fbk_fairseq_st_tpu.data.dictionary import Dictionary

    d = Dictionary(extra_special_symbols=["<mask>"])
    for i in range(12):
        d.add_symbol(f"tok{i}")
    d.finalize(padding_factor=1)
    assert d.nspecial == 5 and d.index("<mask>") == 4

    class T:
        source_dictionary = d
        target_dictionary = d

    args = model_args("transformer", **TINY)
    registry.apply_architecture(args)
    model = registry.build_model(args, T())
    variables = model.init(jax.random.PRNGKey(3))
    generator = SequenceGenerator(d, beam_size=2, max_len_b=6)
    out = str(tmp_path / "mask")
    export_artifact(
        [(model, variables)], generator, [(2, 8)], out,
        tgt_dict=d, src_dict=d, platforms=("cpu",),
    )
    sm = ServingModel.load(out)
    assert len(sm.tgt_dict) == len(d)
    assert sm.tgt_dict.indices == d.indices  # every id identical
    assert sm.tgt_dict.index("<mask>") == 4


def test_export_bos_token_matches_live(mt_artifact, tmp_path):
    """bos_token baked at export time must reproduce the live generator
    called with the same bos (the multilingual lang-token contract)."""
    d, model, variables, generator, _, _ = mt_artifact
    bos = d.nspecial + 1
    out = str(tmp_path / "bos")
    export_artifact(
        [(model, variables)], generator, [(2, 8)], out,
        tgt_dict=d, src_dict=d, platforms=("cpu",), bos_token=bos,
    )
    sm = ServingModel.load(out)
    inputs = mt_inputs(d, 2)
    got = sm.translate(inputs, nbest=1)
    pad = generator.pad
    src = np.full((2, 8), pad, np.int32)
    lengths = np.zeros((2,), np.int32)
    for i, x in enumerate(inputs):
        src[i, : len(x)] = x
        lengths[i] = len(x)
    want = generator.generate(
        [(model, variables)],
        {"net_input": {"src_tokens": src, "src_lengths": lengths}},
        bos_token=bos,
    )
    for g_sent, w_sent in zip(got, want):
        np.testing.assert_array_equal(
            g_sent[0]["tokens"], w_sent[0]["tokens"]
        )


def test_audio_artifact_roundtrip(tmp_path):
    """ST path: conv_transformer over fbank features, audio src_spec."""
    d = dummy_dictionary(20)
    task = DummyTask(tgt_dict=d)
    args = model_args("conv_transformer", input_feat_per_channel=8, **TINY)
    registry.apply_architecture(args)
    model = registry.build_model(args, task)
    variables = model.init(jax.random.PRNGKey(11))
    generator = SequenceGenerator(d, beam_size=2, max_len_b=6)
    out = str(tmp_path / "audio")
    export_artifact(
        [(model, variables)],
        generator,
        [(2, 24)],
        out,
        tgt_dict=d,
        src_spec={"kind": "audio", "dtype": "float32", "suffix": [8]},
        platforms=("cpu",),
    )
    sm = ServingModel.load(out)
    rng = np.random.RandomState(5)
    feats = [rng.randn(24, 8).astype(np.float32),
             rng.randn(17, 8).astype(np.float32)]
    got = sm.translate(feats, nbest=2)

    src = np.zeros((2, 24, 8), np.float32)
    src[0] = feats[0]
    src[1, :17] = feats[1]
    sample = {"net_input": {
        "src_tokens": src,
        "src_lengths": np.array([24, 17], np.int32),
    }}
    want = generator.generate([(model, variables)], sample)
    for g_sent, w_sent in zip(got, want):
        for g, w in zip(g_sent, w_sent[:2]):
            np.testing.assert_array_equal(g["tokens"], w["tokens"])
            assert abs(g["score"] - w["score"]) < 1e-5


def test_quantized_export_roundtrip(tmp_path):
    """--quantize-weights int8 composes: dequant traces into the program,
    int8 payloads land in the npz, decode matches the live quantized
    ensemble."""
    from fbk_fairseq_st_tpu.quantization.weight_only import (
        quantize_linear_weights,
    )

    d, model, variables = build_tiny_mt()
    qparams, stats = quantize_linear_weights(
        variables["params"], min_size=16
    )
    assert stats["quantized"] > 0
    models = [(model, {**variables, "params": qparams})]
    generator = SequenceGenerator(d, beam_size=2, max_len_b=8)
    out = str(tmp_path / "q")
    export_artifact(
        models, generator, [(2, 8)], out, tgt_dict=d, src_dict=d,
        platforms=("cpu",),
    )
    # int8 payloads really are int8 in the artifact
    with np.load(out + "/weights/model0.npz") as z:
        q_keys = [k for k in z.files if k.endswith("w_q")]
        assert q_keys and all(z[k].dtype == np.int8 for k in q_keys)
    sm = ServingModel.load(out)
    inputs = mt_inputs(d, 2)
    got = sm.translate(inputs, nbest=1)
    want = live_decode(
        generator, models[0][0], models[0][1], inputs, src_len=8
    )
    for g_sent, w_sent in zip(got, want):
        np.testing.assert_array_equal(
            g_sent[0]["tokens"], w_sent[0]["tokens"]
        )


@pytest.mark.quick
def test_http_serve_roundtrip(mt_artifact):
    from http.server import ThreadingHTTPServer

    from fbk_fairseq_st_tpu.cli.serve import make_handler

    d, model, variables, generator, out, _ = mt_artifact
    sm = ServingModel.load(out)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(sm))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
        conn.request("GET", "/health")
        assert json.loads(conn.getresponse().read()) == {"status": "ok"}
        conn.request("GET", "/meta")
        assert json.loads(conn.getresponse().read())["beam_size"] == 3

        inputs = mt_inputs(d, 2)
        payload = {
            "instances": [{"tokens": x.tolist()} for x in inputs],
            "nbest": 1,
        }
        conn.request(
            "POST", "/translate", body=json.dumps(payload),
            headers={"Content-Type": "application/json"},
        )
        resp = json.loads(conn.getresponse().read())
        want = sm.translate(inputs, nbest=1)
        assert [p[0]["tokens"] for p in resp["predictions"]] == [
            np.asarray(w[0]["tokens"]).tolist() for w in want
        ]

        # malformed payload -> 400 with an error message
        conn.request("POST", "/translate", body=json.dumps({}))
        r = conn.getresponse()
        assert r.status == 400 and "instances" in json.loads(r.read())["error"]
    finally:
        server.shutdown()
        server.server_close()


def test_export_cli_end_to_end(tmp_path):
    """Full CLI pass: preprocess -> 1-epoch train -> export_serving ->
    runtime decode of real test data (the torchscript-export workflow a
    fork user would run)."""
    import os

    from fbk_fairseq_st_tpu.cli import export_serving as export_cli
    from fbk_fairseq_st_tpu.cli import train as train_cli

    from .test_translation import TRANSLATION_ARGS, create_translation_data

    data_dir, save_dir = str(tmp_path / "data"), str(tmp_path / "ckpt")
    create_translation_data(data_dir)
    train_cli.cli_main(
        [data_dir, "--save-dir", save_dir]
        + TRANSLATION_ARGS
        + ["--max-epoch", "1"]  # last occurrence wins
    )

    out = str(tmp_path / "artifact")
    export_cli.cli_main(
        [
            data_dir,
            "--task", "translation", "-s", "en", "-t", "de",
            "--path", os.path.join(save_dir, "checkpoint_last.pt"),
            "--beam", "2", "--max-len-b", "10",
            "--serving-output", out,
            "--export-buckets", "2x16",
            "--export-platforms", "cpu",
        ]
    )
    sm = ServingModel.load(out)
    assert sm.src_dict is not None
    res = sm.translate([sm.encode_source("hello world")], nbest=1)
    assert res[0] and isinstance(res[0][0]["text"], str)


def test_dynamic_batcher_identical_results_and_coalescing(mt_artifact):
    """Concurrent submissions through the DynamicBatcher return the SAME
    hypotheses as direct translate_many calls, and genuinely share
    dispatches (fewer batches than submitters)."""
    import threading

    from fbk_fairseq_st_tpu.serving.batcher import DynamicBatcher

    d, model, variables, generator, out, _ = mt_artifact
    sm = ServingModel.load(out)
    inputs = mt_inputs(d, 8)
    want = [sent for sent in sm.translate_many(inputs, nbest=2)]

    batcher = DynamicBatcher(sm, window_ms=200.0)
    try:
        results = [None] * len(inputs)
        errors = []

        def worker(i):
            try:
                results[i] = batcher.submit_many([inputs[i]], nbest=2)[0]
            except BaseException as e:  # pragma: no cover
                errors.append(e)

        threads = [
            threading.Thread(target=worker, args=(i,))
            for i in range(len(inputs))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        for got_sent, want_sent in zip(results, want):
            assert len(got_sent) == 2
            for g, w in zip(got_sent, want_sent[:2]):
                np.testing.assert_array_equal(g["tokens"], w["tokens"])
                assert abs(g["score"] - w["score"]) < 1e-6
        # 8 one-instance requests must NOT cost 8 dispatch rounds
        assert batcher.items_dispatched == len(inputs)
        assert batcher.batches_dispatched < len(inputs)
    finally:
        batcher.close()


def test_dynamic_batcher_propagates_errors_and_respects_nbest(mt_artifact):
    from fbk_fairseq_st_tpu.serving.batcher import DynamicBatcher

    d, model, variables, generator, out, _ = mt_artifact
    sm = ServingModel.load(out)
    batcher = DynamicBatcher(sm, window_ms=0.0)
    try:
        inputs = mt_inputs(d, 3)
        got = batcher.submit_many(inputs, nbest=1)
        assert [len(s) for s in got] == [1, 1, 1]
        # an oversize input (no fitting bucket) faults ONLY its own batch
        too_long = np.full((40,), d.eos(), np.int32)
        with pytest.raises(ValueError):
            batcher.submit_many([too_long], nbest=1)
        # the batcher survives the fault and keeps serving
        again = batcher.submit_many(inputs, nbest=1)
        for a, b in zip(got, again):
            np.testing.assert_array_equal(a[0]["tokens"], b[0]["tokens"])
    finally:
        batcher.close()


def test_serve_payload_uses_batcher(mt_artifact):
    """The serve CLI's payload path routes through the batcher when one
    is configured (same predictions as the direct path)."""
    from fbk_fairseq_st_tpu.cli.serve import translate_payload
    from fbk_fairseq_st_tpu.serving.batcher import DynamicBatcher

    d, model, variables, generator, out, _ = mt_artifact
    sm = ServingModel.load(out)
    inputs = mt_inputs(d, 3)
    payload = {"instances": [{"tokens": x.tolist()} for x in inputs],
               "nbest": 2}
    direct = translate_payload(sm, payload)
    batcher = DynamicBatcher(sm, window_ms=0.0)
    try:
        batched = translate_payload(sm, payload, batcher)
    finally:
        batcher.close()
    assert direct == batched
    assert batcher.items_dispatched == 3


def test_dynamic_batcher_isolates_faults_across_cobatched_requests(
    mt_artifact,
):
    """A malformed request coalesced with a valid one must fail ALONE:
    the valid co-batched request gets its normal result (batched ==
    unbatched outcomes, the batcher's core guarantee)."""
    import threading

    from fbk_fairseq_st_tpu.serving.batcher import DynamicBatcher

    d, model, variables, generator, out, _ = mt_artifact
    sm = ServingModel.load(out)
    good = mt_inputs(d, 1)[0]
    want = sm.translate_many([good], nbest=1)[0]
    too_long = np.full((40,), d.eos(), np.int32)  # no bucket fits

    batcher = DynamicBatcher(sm, window_ms=300.0)
    try:
        outcome = {}

        def submit(key, arr):
            try:
                outcome[key] = ("ok", batcher.submit_many([arr], nbest=1)[0])
            except Exception as e:
                outcome[key] = ("err", e)

        threads = [
            threading.Thread(target=submit, args=("good", good)),
            threading.Thread(target=submit, args=("bad", too_long)),
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert outcome["bad"][0] == "err"
        assert isinstance(outcome["bad"][1], ValueError)
        assert outcome["good"][0] == "ok", outcome["good"]
        np.testing.assert_array_equal(
            outcome["good"][1][0]["tokens"], want[0]["tokens"]
        )
    finally:
        batcher.close()
