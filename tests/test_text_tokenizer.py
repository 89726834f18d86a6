"""Text frontend tests: cleaning, splitting, dialogue chunking, tokenizer."""

import pytest

from fireredtts2_tpu.utils.text import (
    clean_text, split_text, process_text, process_text_list,
)
from fireredtts2_tpu.utils.tokenizer import (
    ByteTokenizer, ADDITIONAL_SPECIAL_TOKENS,
)


def test_clean_text_symbol_mapping():
    assert clean_text("你好！世界") == "你好，世界"
    assert clean_text("a:b;c") == "a,b,c"
    assert clean_text('say "hi" (ok) [x]') == "say hi ok x"
    assert clean_text("wow…") == "wow,"
    assert clean_text("a....b,,,c") == "a.b,c"
    assert clean_text("tab\there\nline") == "tabhereline"


def test_clean_text_strips_emoji():
    assert clean_text("hello 😀🚀 world") == "hello  world"


def test_split_text_respects_length_and_floats():
    text = "Pi is 3.14159. " + "word " * 50 + ". Short one."
    segs = split_text(text, 80)
    assert all(len(s.encode("utf-8")) <= 80 for s in segs)
    assert any("3.14159" in s for s in segs)  # float not split


def test_process_text_english_limit():
    text = "[S1]" + ("This is a sentence. " * 30)
    chunks = process_text(text)
    assert len(chunks) > 1
    assert all(len(c.split()) <= 80 for c in chunks)


def test_process_text_chinese_limit():
    text = "[S2]" + ("这是一个句子。" * 40)
    chunks = process_text(text)
    assert len(chunks) > 1
    assert all(len(c) <= 150 for c in chunks)


def test_process_text_list_keeps_speakers():
    out = process_text_list(["[S1]Hello there.", "[S2]Hi."])
    assert out == ["[S1]Hello there.", "[S2]Hi."]
    long = "[S1]" + ("A sentence goes here. " * 30)
    out = process_text_list([long])
    assert all(o.startswith("[S1]") for o in out)


def test_process_text_list_rejects_bad_speaker():
    with pytest.raises(ValueError):
        process_text_list(["[S9]Nope."])


def test_special_token_inventory():
    # Same counts as reference llm/utils.py:62-187
    assert "<|text_start|>" in ADDITIONAL_SPECIAL_TOKENS
    assert "[S40]" in ADDITIONAL_SPECIAL_TOKENS
    assert "[S_PODCAST_10]" in ADDITIONAL_SPECIAL_TOKENS
    assert "<|emotion_neutral|>" in ADDITIONAL_SPECIAL_TOKENS
    assert "<|paralinguistic_extra13|>" in ADDITIONAL_SPECIAL_TOKENS
    assert "<|paralinguistic_extra9|>" not in ADDITIONAL_SPECIAL_TOKENS  # gap in ref
    assert len(ADDITIONAL_SPECIAL_TOKENS) == len(set(ADDITIONAL_SPECIAL_TOKENS))


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    text = "[S1]<|text_start|>héllo, 世界<|text_end|>"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # special tokens are single ids
    assert ids[0] == 256 + ADDITIONAL_SPECIAL_TOKENS.index("[S1]")
    assert all(0 <= i < tok.vocab_size for i in ids)
