"""Conversation-LLM backends (serve/llm.py) — local HF causal LM, an
OpenAI-compatible HTTP endpoint (faked locally; zero-egress image), and the
primary->fallback chain semantics."""

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from fireredtts2_tpu.serve.llm import (
    HFCausalLMResponder, OpenAICompatResponder, build_responder_chain,
)
from fireredtts2_tpu.serve.s2s import ResponderChain, RuleBasedResponder


# ------------------------------------------------------------- HF causal LM


@pytest.fixture(scope="module")
def tiny_hf_dir(tmp_path_factory):
    """A tiny random GPT2 + word-level tokenizer saved locally (the backend
    loads local_files_only — no downloads)."""
    torch = pytest.importorskip("torch")
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import GPT2Config, GPT2LMHeadModel, PreTrainedTokenizerFast

    d = tmp_path_factory.mktemp("tiny_gpt2")
    words = ["hello", "world", "how", "are", "you", "good", "fine", "thanks",
             "the", "a", "i", "is", "it", "yes", "no"]
    vocab = {"<|endoftext|>": 0, "<unk>": 1}
    vocab.update({w: i + 2 for i, w in enumerate(words)})
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, eos_token="<|endoftext|>", unk_token="<unk>",
        pad_token="<|endoftext|>")

    torch.manual_seed(0)
    cfg = GPT2Config(vocab_size=len(vocab), n_positions=64, n_embd=32,
                     n_layer=2, n_head=2)
    GPT2LMHeadModel(cfg).save_pretrained(d)
    fast.save_pretrained(d)
    return str(d)


def test_hf_responder_generates(tiny_hf_dir):
    r = HFCausalLMResponder(tiny_hf_dir, max_new_tokens=8, greedy=True)
    out = r("hello how are you", [("user", "hello"), ("assistant", "hello world")])
    assert isinstance(out, str)
    assert r.total_generations == 1
    assert r.stats()["backend"] == "hf-causal-lm"
    # deterministic under greedy
    assert r("hello how are you",
             [("user", "hello"), ("assistant", "hello world")]) == out


def test_hf_responder_missing_dir_raises():
    r = HFCausalLMResponder("/nonexistent/model/dir")
    with pytest.raises(Exception):
        r("hi", [])


# ------------------------------------------------------- OpenAI-compatible


@pytest.fixture(scope="module")
def fake_openai():
    """Minimal OpenAI-compatible /chat/completions server."""
    seen = {}

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(n))
            seen["last"] = req
            seen["auth"] = self.headers.get("Authorization")
            if self.path != "/v1/chat/completions":
                self.send_response(404)
                self.end_headers()
                return
            user_text = req["messages"][-1]["content"]
            body = json.dumps({
                "choices": [{"message": {
                    "role": "assistant",
                    "content": f"echo: {user_text}"}, "finish_reason": "stop"}],
                "usage": {"total_tokens": 42},
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    from conftest import free_port

    port = free_port()
    httpd = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield {"url": f"http://127.0.0.1:{port}/v1", "seen": seen}
    httpd.shutdown()


def test_openai_responder_roundtrip(fake_openai):
    r = OpenAICompatResponder(fake_openai["url"], model="test-model",
                              api_key="sk-test")
    out = r("what time is it", [("user", "hi"), ("assistant", "hello!")])
    assert out == "echo: what time is it"
    assert r.total_tokens_used == 42
    req = fake_openai["seen"]["last"]
    assert req["model"] == "test-model"
    assert req["messages"][0]["role"] == "system"
    assert [m["role"] for m in req["messages"][1:]] == ["user", "assistant", "user"]
    assert fake_openai["seen"]["auth"] == "Bearer sk-test"


def test_openai_responder_error_propagates():
    r = OpenAICompatResponder("http://127.0.0.1:1", timeout_s=0.3)
    with pytest.raises(Exception):
        r("hi", [])


# ------------------------------------------------------------- chain logic


def test_chain_falls_back_on_error(fake_openai):
    failing = OpenAICompatResponder("http://127.0.0.1:1", timeout_s=0.3)
    chain = ResponderChain([failing, RuleBasedResponder()])
    out = chain("hello there", [])
    assert out  # rule-based answered after the HTTP backend failed


def test_build_responder_chain_order(fake_openai, tiny_hf_dir):
    chain = build_responder_chain(primary="openai",
                                  hf_model_dir=tiny_hf_dir,
                                  openai_base_url=fake_openai["url"])
    assert isinstance(chain.responders[0], OpenAICompatResponder)
    assert isinstance(chain.responders[1], HFCausalLMResponder)
    assert isinstance(chain.responders[-1], RuleBasedResponder)
    out = chain("ping", [])
    assert out == "echo: ping"


def test_build_responder_chain_rule_only():
    chain = build_responder_chain()
    assert len(chain.responders) == 1
    assert chain("hello", [])
