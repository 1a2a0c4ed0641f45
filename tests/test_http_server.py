"""HTTP serving front-end (dalm_tpu/server_http.py).

Spins the stdlib server over a tiny pipeline on an ephemeral port and
exercises /healthz, /answer (parity with pipe.answer), /stream (chunked
incremental text), bad-request handling, and concurrent requests
sharing the slot pool.
"""

import json
import threading
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server():
    from dalm_tpu.serve import RagPipeline
    from dalm_tpu.server_http import RagHTTPServer

    passages = [f"passage {i} about metro-{i} and its {i} towers" for i in range(8)]
    pipe = RagPipeline.from_pretrained(
        "tiny", "tiny", passages,
        max_passage_len=32, max_prompt_len=64, max_new_tokens=5, embed_batch=8,
    )
    srv = RagHTTPServer(pipe, host="127.0.0.1", port=0, num_slots=2, decode_chunk=2)
    srv.start_background()
    yield srv, pipe
    srv.shutdown()


def _post(srv, path, body):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    return urllib.request.urlopen(req, timeout=120)


def test_healthz(server):
    srv, _ = server
    with urllib.request.urlopen(f"http://{srv.host}:{srv.port}/healthz", timeout=30) as r:
        payload = json.loads(r.read())
    assert payload == {"status": "ok", "passages": 8}


def test_answer_matches_pipeline(server):
    srv, pipe = server
    q = "what about metro-3"
    with _post(srv, "/answer", {"query": q, "top_k": 2}) as r:
        payload = json.loads(r.read())
    expected = pipe.answer([q], top_k=2)[0]
    assert payload["answer"] == expected.answer
    assert payload["passages"] == expected.passages


def test_stream_is_chunked_and_matches(server):
    srv, pipe = server
    q = "what about metro-5"
    with _post(srv, "/stream", {"query": q, "top_k": 2}) as r:
        assert r.headers.get("Content-Type", "").startswith("text/plain")
        text = r.read().decode("utf-8")  # urllib de-chunks
    expected = pipe.answer([q], top_k=2)[0].answer
    assert text.strip() == expected


def test_bad_request(server):
    srv, _ = server
    try:
        _post(srv, "/answer", {"nope": 1})
        raised = False
    except urllib.error.HTTPError as e:
        raised = True
        assert e.code == 400
    assert raised


def test_concurrent_requests(server):
    srv, pipe = server
    queries = [f"what about metro-{i}" for i in range(5)]
    results = {}

    def go(q):
        with _post(srv, "/answer", {"query": q, "top_k": 2}) as r:
            results[q] = json.loads(r.read())["answer"]

    threads = [threading.Thread(target=go, args=(q,)) for q in queries]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    expected = pipe.answer(queries, top_k=2)
    for q, e in zip(queries, expected):
        assert results[q] == e.answer
