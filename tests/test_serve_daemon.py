"""Serving daemon: request coalescing, HTTP protocol, parity with the
direct Predictor path, stats, shutdown drain."""
import http.client
import io
import json
import threading

import numpy as np

import jax

from istvt_tpu.core.config import ISTVTConfig
from istvt_tpu.models.registry import model_selection
from istvt_tpu.serve import Predictor
from istvt_tpu.serve_daemon import (RequestBatcher, ServeDaemon,
                                    normalize_uint8)

TINY = ISTVTConfig(num_frames=2, image_size=72, feat_hw=5, depth=1)
CLIP = (2, 72, 72, 3)


def _tiny_predictor(buckets=(1, 4, 8)):
    model = model_selection("istvt", num_out_classes=1, cfg=TINY)
    params, state = model.init(jax.random.PRNGKey(0))
    return Predictor(model, params, state, batch_sizes=buckets)


# ---------------------------------------------------------------------------
# RequestBatcher (no HTTP)


def test_batcher_matches_direct_and_coalesces():
    pred = _tiny_predictor()
    rng = np.random.RandomState(0)
    clips = rng.randn(8, *CLIP).astype(np.float32)
    direct = pred.predict(clips)

    # slow predict_fn so the linger window provably coalesces
    calls = []

    def counted(x):
        calls.append(x.shape[0])
        return pred.predict(x)

    b = RequestBatcher(counted, max_batch=8, max_wait_ms=200)
    futs = [b.submit(clips[i:i + 1]) for i in range(8)]
    outs = [f.result(timeout=60) for f in futs]
    b.close()
    got = np.concatenate([o["logits"] for o in outs])
    np.testing.assert_allclose(got, direct["logits"], atol=1e-5)
    # 8 bs=1 submissions within one linger window -> far fewer device
    # calls than requests (scheduling-dependent, but never 8)
    assert len(calls) < 8
    assert max(calls) > 1
    s = b.stats()
    assert s["requests"] == 8 and s["clips"] == 8
    assert s["batches"] == len(calls)
    assert s["latency_ms"]["p50"] is not None


def test_batcher_multi_clip_requests_and_order():
    pred = _tiny_predictor()
    rng = np.random.RandomState(1)
    a = rng.randn(3, *CLIP).astype(np.float32)
    c = rng.randn(2, *CLIP).astype(np.float32)
    b = RequestBatcher(pred.predict, max_batch=8, max_wait_ms=50)
    fa, fc = b.submit(a), b.submit(c)
    out_a, out_c = fa.result(timeout=60), fc.result(timeout=60)
    b.close()
    np.testing.assert_allclose(out_a["logits"], pred.predict(a)["logits"],
                               atol=1e-5)
    np.testing.assert_allclose(out_c["logits"], pred.predict(c)["logits"],
                               atol=1e-5)


def test_batcher_error_propagates_and_queue_bound():
    def boom(x):
        raise ValueError("kernel exploded")

    b = RequestBatcher(boom, max_batch=4, max_wait_ms=1)
    f = b.submit(np.zeros((1, *CLIP), np.float32))
    try:
        f.result(timeout=30)
        raised = False
    except ValueError:
        raised = True
    assert raised
    b.close()

    b2 = RequestBatcher(lambda x: {"logits": np.zeros(x.shape[0])},
                        max_batch=4, max_wait_ms=1, max_queue=2)
    # a 3-clip request can never fit the 2-clip queue bound
    try:
        b2.submit(np.zeros((3, *CLIP), np.float32))
        overflowed = False
    except OverflowError:
        overflowed = True
    assert overflowed
    b2.close()


def test_batcher_close_drains():
    pred = _tiny_predictor()
    b = RequestBatcher(pred.predict, max_batch=4, max_wait_ms=500)
    futs = [b.submit(np.zeros((1, *CLIP), np.float32)) for _ in range(3)]
    b.close()  # must flush the lingering batch, not drop it
    for f in futs:
        assert f.result(timeout=5)["logits"].shape == (1,)


# ---------------------------------------------------------------------------
# HTTP daemon


def _post_npy(port, arr, path="/v1/predict"):
    buf = io.BytesIO()
    np.save(buf, arr)
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
    conn.request("POST", path, body=buf.getvalue())
    r = conn.getresponse()
    body = json.loads(r.read().decode())
    conn.close()
    return r.status, body


def test_daemon_http_roundtrip():
    pred = _tiny_predictor()
    daemon = ServeDaemon(pred, CLIP, port=0, max_batch=8,
                         max_wait_ms=5).start()
    try:
        rng = np.random.RandomState(2)
        clips = rng.randn(3, *CLIP).astype(np.float32)
        status, out = _post_npy(daemon.port, clips)
        assert status == 200
        direct = pred.predict(clips)
        np.testing.assert_allclose(out["logits"], direct["logits"],
                                   atol=1e-5)
        assert out["preds"] == [int(x) for x in direct["preds"]]

        # single clip without the leading batch dim
        status, out1 = _post_npy(daemon.port, clips[0])
        assert status == 200 and len(out1["logits"]) == 1

        # uint8 path normalizes server-side with (x/255 - .5)/.5
        raw = rng.randint(0, 256, (1, *CLIP), dtype=np.uint8)
        status, out_u = _post_npy(daemon.port, raw)
        ref = pred.predict(normalize_uint8(raw))
        np.testing.assert_allclose(out_u["logits"], ref["logits"],
                                   atol=1e-5)

        # health + stats + 4xx
        conn = http.client.HTTPConnection("127.0.0.1", daemon.port,
                                          timeout=30)
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["ok"] is True
        conn.request("GET", "/v1/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["clips"] >= 5
        conn.close()
        status, err = _post_npy(daemon.port,
                                np.zeros((2, 9, 9, 3), np.float32))
        assert status == 400 and "shape" in err["error"]
        status, _ = _post_npy(daemon.port, clips, path="/nope")
        assert status == 404
    finally:
        daemon.close()


def test_daemon_concurrent_clients_coalesce():
    pred = _tiny_predictor()
    daemon = ServeDaemon(pred, CLIP, port=0, max_batch=8,
                         max_wait_ms=150).start()
    try:
        rng = np.random.RandomState(3)
        clips = rng.randn(6, *CLIP).astype(np.float32)
        direct = pred.predict(clips)
        results = [None] * 6

        def client(i):
            status, out = _post_npy(daemon.port, clips[i:i + 1])
            assert status == 200
            results[i] = out["logits"][0]

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        np.testing.assert_allclose(np.array(results), direct["logits"],
                                   atol=1e-5)
        s = daemon.batcher.stats()
        assert s["batches"] < s["requests"]  # coalescing actually happened
    finally:
        daemon.close()
