"""OpenAI-compatible HTTP front-end: real-socket request/response tests."""

import json
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from lamp_tpu import nn
from lamp_tpu.data.tokenizer import IdentityCodec
from lamp_tpu.models.openai_api import (
    APIError,
    OpenAIFrontend,
    OpenAIHTTPServer,
    _apply_stop_strings,
)
from lamp_tpu.models.sampling import SamplingParams
from lamp_tpu.models.serving import ModernBatchServer, ServingEngine


@pytest.fixture(scope="module")
def api():
    model = nn.ModernLM.init(
        vocab_size=256, context_length=64, num_blocks=2, embed_dim=64,
        num_heads=4, key=jax.random.PRNGKey(0))
    server = ModernBatchServer(model, page_size=8, total_pages=64)
    engine = ServingEngine(server, decode_steps=4, max_batch=8)
    fe = OpenAIFrontend(engine, IdentityCodec(), model_name="tiny-byte-lm",
                        default_max_tokens=8)
    srv = OpenAIHTTPServer(fe, port=0)
    srv.start()
    yield srv
    srv.shutdown()


def _post(api, path, body, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{api.port}{path}",
        data=json.dumps(body).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _post_stream(api, path, body, timeout=120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{api.port}{path}",
        data=json.dumps(body).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    chunks, done = [], False
    with urllib.request.urlopen(req, timeout=timeout) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for line in r:
            line = line.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                done = True
            else:
                chunks.append(json.loads(payload))
    assert done
    return chunks


def test_models_and_health(api):
    with urllib.request.urlopen(
            f"http://127.0.0.1:{api.port}/health", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(
            f"http://127.0.0.1:{api.port}/v1/models", timeout=30) as r:
        doc = json.loads(r.read())
    assert doc["data"][0]["id"] == "tiny-byte-lm"


def test_completion_greedy_deterministic(api):
    body = {"prompt": "hello", "temperature": 0.0, "max_tokens": 6}
    a = _post(api, "/v1/completions", body)
    b = _post(api, "/v1/completions", body)
    assert a["object"] == "text_completion"
    assert a["choices"][0]["text"] == b["choices"][0]["text"]
    assert a["choices"][0]["finish_reason"] == "length"
    assert a["usage"]["prompt_tokens"] == 5
    assert a["usage"]["completion_tokens"] == 6
    assert a["usage"]["total_tokens"] == 11


def test_completion_stream_matches_nonstream(api):
    body = {"prompt": "abc", "temperature": 0.0, "max_tokens": 6}
    full = _post(api, "/v1/completions", body)["choices"][0]["text"]
    chunks = _post_stream(api, "/v1/completions", dict(body, stream=True))
    text = "".join(c["choices"][0]["text"] for c in chunks)
    assert text == full
    assert chunks[-1]["choices"][0]["finish_reason"] == "length"


def test_stop_string_cuts_generation(api):
    body = {"prompt": "xyz", "temperature": 0.0, "max_tokens": 8}
    full = _post(api, "/v1/completions", body)["choices"][0]["text"]
    assert len(full) >= 3
    stop = full[2:4]  # substring the greedy output definitely contains
    cut = _post(api, "/v1/completions", dict(body, stop=stop))
    assert cut["choices"][0]["text"] == full[:full.find(stop)]
    assert cut["choices"][0]["finish_reason"] == "stop"
    # streamed variant emits the same cut text and cancels server-side
    chunks = _post_stream(api, "/v1/completions",
                          dict(body, stop=stop, stream=True))
    text = "".join(c["choices"][0]["text"] for c in chunks)
    assert text == full[:full.find(stop)]
    assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
    assert not api.frontend.engine.server.seq_pages  # pages freed


def test_chat_completion_roundtrip(api):
    body = {"messages": [{"role": "user", "content": "hi"}],
            "temperature": 0.0, "max_tokens": 5}
    resp = _post(api, "/v1/chat/completions", body)
    assert resp["object"] == "chat.completion"
    msg = resp["choices"][0]["message"]
    assert msg["role"] == "assistant"
    assert isinstance(msg["content"], str)
    chunks = _post_stream(api, "/v1/chat/completions",
                          dict(body, stream=True))
    streamed = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
    assert streamed == msg["content"]


def test_parallel_sampling_n(api):
    body = {"prompt": "seed", "temperature": 1.0, "max_tokens": 4, "n": 2,
            "logprobs": True}
    resp = _post(api, "/v1/completions", body)
    assert [c["index"] for c in resp["choices"]] == [0, 1]
    for c in resp["choices"]:
        assert len(c["logprobs"]["token_logprobs"]) == len(
            c["logprobs"]["tokens"])
    assert resp["usage"]["completion_tokens"] == sum(
        len(c["logprobs"]["tokens"]) for c in resp["choices"])


def test_concurrent_requests_batch(api):
    """Many clients at once: continuous batching serves all correctly."""
    body = {"prompt": "hello", "temperature": 0.0, "max_tokens": 6}
    expected = _post(api, "/v1/completions", body)["choices"][0]["text"]
    out, errs = [None] * 4, []

    def hit(i):
        try:
            out[i] = _post(api, "/v1/completions", body)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errs
    assert all(r["choices"][0]["text"] == expected for r in out)


def test_bad_requests_return_400(api):
    for body in [
        {"prompt": 7},
        {"prompt": "x", "temperature": -1.0},
        {"prompt": "x", "max_tokens": 0},
        {"prompt": "x", "n": 2, "temperature": 0.0},
        {"prompt": "x" * 500},                      # longer than context
        {"prompt": "x", "stream": True, "n": 2, "temperature": 1.0},
    ]:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(api, "/v1/completions", body)
        assert ei.value.code == 400
        assert "error" in json.loads(ei.value.read())


def test_engine_cancel_frees_pages():
    model = nn.ModernLM.init(
        vocab_size=64, context_length=32, num_blocks=1, embed_dim=32,
        num_heads=2, key=jax.random.PRNGKey(1))
    server = ModernBatchServer(model, page_size=8, total_pages=16)
    engine = ServingEngine(server, decode_steps=2, max_batch=4)
    free0 = server.available_pages
    a = engine.submit([1, 2, 3], SamplingParams(max_tokens=20))
    b = engine.submit([4, 5], SamplingParams(max_tokens=4))
    engine.step()                    # both admitted and decoding
    assert a in server.seq_pages and b in server.seq_pages
    assert engine.cancel(a)          # in-flight cancel
    assert a not in server.seq_pages
    assert not engine.cancel(a)      # second cancel is a no-op
    c = engine.submit([7, 8], SamplingParams(temperature=1.0, max_tokens=4),
                      n=2)
    assert engine.cancel(c)          # fan-out parent cancel (still pending)
    results = engine.run()
    assert set(results) == {b}
    assert len(results[b]) <= 4
    assert server.available_pages == free0


def test_stop_string_helper():
    assert _apply_stop_strings("abcdef", ["cd", "e"]) == ("ab", True)
    assert _apply_stop_strings("abcdef", []) == ("abcdef", False)
    assert _apply_stop_strings("abc", ["zz"]) == ("abc", False)


def test_frontend_direct_api_error():
    model = nn.ModernLM.init(
        vocab_size=64, context_length=32, num_blocks=1, embed_dim=32,
        num_heads=2, key=jax.random.PRNGKey(1))
    engine = ServingEngine(ModernBatchServer(model, page_size=8,
                                             total_pages=16))
    fe = OpenAIFrontend(engine, IdentityCodec())
    with pytest.raises(APIError):
        fe.completion({"prompt": ""})          # empty after encode
    with pytest.raises(APIError):
        fe.chat_completion({"messages": []})


def test_metrics_endpoint(api):
    body = {"prompt": "m", "temperature": 0.0, "max_tokens": 3}
    _post(api, "/v1/completions", body)
    with urllib.request.urlopen(
            f"http://127.0.0.1:{api.port}/metrics", timeout=30) as r:
        text = r.read().decode()
    metrics = {line.split()[0]: float(line.split()[1])
               for line in text.splitlines() if not line.startswith("#")}
    assert metrics["lamp_requests_total"] >= 1
    assert metrics["lamp_generated_tokens_total"] >= 3
    assert metrics["lamp_requests_running"] == 0
    # total minus the reserved trash page (serving.py:119) is free again
    assert metrics["lamp_kv_pages_free"] == metrics["lamp_kv_pages_total"] - 1
