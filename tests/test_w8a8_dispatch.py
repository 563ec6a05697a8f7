"""Pairing-aware W8A8 dispatch (VERDICT r4 item 4 / weak 2).

The 85M decode gate passes W8A8-decode with INT4 KV (+0.483%) but fails
it with INT8 KV (+0.507%): the dispatch must key off the declared KV
mode instead of leaving the caveat in prose. _on_tpu is monkeypatched —
the threshold logic is platform-independent.
"""

import pytest

from block_transformer_tpu.ops import linear


@pytest.fixture
def on_tpu(monkeypatch):
    monkeypatch.setattr(linear, "_on_tpu", lambda: True)
    monkeypatch.delenv("BT_W8A8_M_MIN", raising=False)
    monkeypatch.delenv("BT_W8A8", raising=False)


def test_default_includes_decode_m(on_tpu):
    assert linear._use_w8a8(384)
    assert not linear._use_w8a8(256)


def test_int8_kv_pairing_goes_prefill_only(on_tpu):
    with linear.kv_mode("int8"):
        assert not linear._use_w8a8(384)     # decode-sized M excluded
        assert linear._use_w8a8(2048)        # prefill still W8A8
    with linear.kv_mode("int4"):             # headline pairing: decode on
        assert linear._use_w8a8(384)
    with linear.kv_mode("bf16"):
        assert linear._use_w8a8(384)


def test_env_override_wins(on_tpu, monkeypatch):
    monkeypatch.setenv("BT_W8A8_M_MIN", "384")
    with linear.kv_mode("int8"):
        assert linear._use_w8a8(384)         # explicit env beats pairing
    monkeypatch.setenv("BT_W8A8_M_MIN", str(10 ** 9))
    with linear.kv_mode("int4"):
        assert not linear._use_w8a8(10 ** 6)


def test_kv_mode_restores(on_tpu):
    with linear.kv_mode("int8"):
        pass
    assert linear._use_w8a8(384)             # default restored after exit
