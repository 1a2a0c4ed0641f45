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


def test_openai_models(server):
    srv, _ = server
    with urllib.request.urlopen(f"http://{srv.host}:{srv.port}/v1/models", timeout=30) as r:
        payload = json.loads(r.read())
    assert payload["object"] == "list"
    assert payload["data"][0]["id"] == "dalm-rag"


def test_openai_chat_completion(server):
    srv, pipe = server
    q = "what about metro-5"
    body = {
        "model": "dalm-rag",
        "messages": [
            {"role": "system", "content": "you answer from passages"},
            {"role": "user", "content": q},
        ],
        "top_k": 2,
    }
    with _post(srv, "/v1/chat/completions", body) as r:
        payload = json.loads(r.read())
    expected = pipe.answer([q], top_k=2)[0]
    assert payload["object"] == "chat.completion"
    assert payload["choices"][0]["message"]["role"] == "assistant"
    assert payload["choices"][0]["message"]["content"] == expected.answer
    # the tiny byte model has no EOS: decode always exhausts the cap
    assert payload["choices"][0]["finish_reason"] == "length"
    assert payload["usage"]["total_tokens"] == (
        payload["usage"]["prompt_tokens"] + payload["usage"]["completion_tokens"]
    )
    assert payload["dalm"]["passages"] == expected.passages


def test_openai_text_completion(server):
    srv, pipe = server
    q = "what about metro-2"
    with _post(srv, "/v1/completions", {"prompt": q, "top_k": 2}) as r:
        payload = json.loads(r.read())
    expected = pipe.answer([q], top_k=2)[0]
    assert payload["object"] == "text_completion"
    assert payload["choices"][0]["text"] == expected.answer


def test_openai_chat_stream_sse(server):
    srv, pipe = server
    q = "what about metro-7"
    body = {"messages": [{"role": "user", "content": q}], "stream": True, "top_k": 2}
    with _post(srv, "/v1/chat/completions", body) as r:
        raw = r.read().decode()
    events = [ln[len("data: "):] for ln in raw.split("\n") if ln.startswith("data: ")]
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
    text = "".join(c["choices"][0]["delta"].get("content", "") for c in chunks)
    assert text == pipe.answer([q], top_k=2)[0].answer
    assert chunks[-1]["choices"][0]["finish_reason"] == "length"  # no EOS: cap always hit


def test_openai_bad_request(server):
    srv, _ = server
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _post(srv, "/v1/chat/completions", {"messages": []})
    assert e.value.code == 400


def test_openai_finish_reason_length(server):
    srv, _ = server
    body = {"messages": [{"role": "user", "content": "what about metro-1"}],
            "max_tokens": 2, "top_k": 2}
    with _post(srv, "/v1/chat/completions", body) as r:
        payload = json.loads(r.read())
    assert payload["choices"][0]["finish_reason"] == "length"
    assert payload["usage"]["completion_tokens"] == 2


def test_openai_bad_typed_fields_return_400(server):
    srv, _ = server
    import urllib.error

    for body in (
        {"messages": [{"role": "user", "content": "q"}], "max_tokens": "abc"},
        {"messages": [{"role": "user", "content": "q"}], "top_k": [2]},
        {"messages": 5},
    ):
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(srv, "/v1/chat/completions", body)
        assert e.value.code == 400


def test_openai_stream_carries_usage_and_dalm(server):
    srv, pipe = server
    q = "what about metro-4"
    body = {"messages": [{"role": "user", "content": q}], "stream": True, "top_k": 2}
    with _post(srv, "/v1/chat/completions", body) as r:
        raw = r.read().decode()
    events = [ln[len("data: "):] for ln in raw.split("\n") if ln.startswith("data: ")]
    chunks = [json.loads(e) for e in events[:-1]]
    assert "dalm" in chunks[0] and chunks[0]["dalm"]["passages"]
    assert chunks[-1]["usage"]["completion_tokens"] > 0
