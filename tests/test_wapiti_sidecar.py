"""Wapiti-protocol sidecar (SURVEY A11, VERDICT r6 #5): the persistent
stdin/stdout stream protocol, watchdog-kill timeout, and
retry-with-restart semantics — reference models/wapiti_model_impl.py."""
from __future__ import annotations

import sys

import pytest

from sciencebeam_parser_spark.plans.wapiti_sidecar import (
    WapitiProtocolError,
    WapitiSidecar,
    WapitiSidecarTimeout,
    fake_labeler_argv,
    normalize_protocol_token,
    resolve_sidecar_argv,
)

HANGING_SRC = "import time; time.sleep(999)"

HANG_ONCE_SRC = r"""
import os, sys, time
marker = {marker!r}
if not os.path.exists(marker):
    open(marker, "w").close()
    time.sleep(999)
for line in sys.stdin:
    line = line.rstrip("\n")
    if not line:
        sys.stdout.write("\n"); sys.stdout.flush(); continue
    tok = line.split("\t", 1)[0]
    sys.stdout.write(tok + "\tB-ok\n"); sys.stdout.flush()
"""

# a labeler that stays ALIVE but emits an EXTRA protocol line for one
# poison token — the deterministic-desync case the retry loop must NOT
# burn 10 process spawns on
EXTRA_LINE_SRC = r"""
import sys
for line in sys.stdin:
    line = line.rstrip("\n")
    if not line:
        sys.stdout.write("\n"); sys.stdout.flush(); continue
    tok = line.split("\t", 1)[0]
    sys.stdout.write(tok + "\tB-ok\n")
    if tok == "POISON":
        sys.stdout.write(tok + "\tB-extra\n")
    sys.stdout.flush()
"""

CRASH_ONCE_SRC = r"""
import os, sys
marker = {marker!r}
if not os.path.exists(marker):
    open(marker, "w").close()
    sys.exit(1)
for line in sys.stdin:
    line = line.rstrip("\n")
    if not line:
        sys.stdout.write("\n"); sys.stdout.flush(); continue
    tok = line.split("\t", 1)[0]
    sys.stdout.write(tok + "\tB-ok\n"); sys.stdout.flush()
"""


class TestProtocol:
    def test_labels_round_trip(self):
        s = WapitiSidecar()
        out = s.label_sequences(
            [["12345", "abcdef", "apple", "x"], ["zz"]]
        )
        assert out == [
            ["B-num", "B-long", "B-vowel", "I-other"],
            ["I-other"],
        ]
        s.stop()

    def test_process_persists_across_calls(self):
        s = WapitiSidecar()
        s.label_sequences([["a"]])
        pid1 = s._proc.pid
        s.label_sequences([["b"], ["c"]])
        assert s._proc.pid == pid1  # ONE persistent process, reused
        assert s.restart_counter == 1
        s.stop()

    def test_empty_input(self):
        s = WapitiSidecar()
        assert s.label_sequences([]) == []

    def test_token_with_newline_does_not_desync(self):
        s = WapitiSidecar()
        out = s.label_sequences([["bad\ntok", "ok"]])
        assert len(out) == 1 and len(out[0]) == 2
        s.stop()

    def test_token_with_carriage_return_does_not_desync(self):
        # VERDICT r7 #1 regression: \r splits a line in the text-mode
        # pipe (universal newlines), desyncing the protocol — the exact
        # payloads that crashed round 7
        s = WapitiSidecar()
        # labels are computed on the NORMALIZED token:
        # "\r" -> " " (I-other); "a\rb" -> "a b" (leading vowel);
        # "ab\rcd" -> "ab cd" (len 5, leading 'a' -> B-vowel);
        # "zzz\rzzz" -> "zzz zzz" (len 7 -> B-long)
        assert s.label_sequences([["\r"]]) == [["I-other"]]
        assert s.label_sequences([["a\rb", "xk"]]) == [
            ["B-vowel", "I-other"]
        ]
        assert s.label_sequences([["ab\rcd", "zzz\rzzz"]]) == [
            ["B-vowel", "B-long"]
        ]
        s.stop()

    def test_normalize_protocol_token(self):
        assert normalize_protocol_token("a\rb") == "a b"
        assert normalize_protocol_token("a\nb\tc\x00d") == "a b c d"
        assert normalize_protocol_token("") == "_"
        assert normalize_protocol_token("\r") == " "
        assert normalize_protocol_token("plain") == "plain"

    def test_resolution_order(self, monkeypatch):
        # injected argv wins
        assert resolve_sidecar_argv(argv=["x"]) == ["x"]
        # no wapiti on PATH -> deterministic fake
        from sciencebeam_parser_spark.sources import binprobe

        monkeypatch.setattr(binprobe, "which", lambda name: None)
        assert resolve_sidecar_argv(model_path="/m") == fake_labeler_argv()
        # wapiti present + model path -> real stream invocation
        monkeypatch.setattr(
            binprobe, "which", lambda name: "/usr/bin/wapiti"
        )
        argv = resolve_sidecar_argv(model_path="/m/model.wapiti")
        assert argv[:3] == ["/usr/bin/wapiti", "label", "--stream"]
        assert argv[-1] == "/m/model.wapiti"


class TestTimeoutRetry:
    def test_hanging_sidecar_times_out_kills_and_retries(self):
        s = WapitiSidecar(
            argv=[sys.executable, "-u", "-c", HANGING_SRC],
            timeout_s=0.2,
            trial_count=2,
        )
        with pytest.raises(Exception):
            s.label_sequences([["tok"]])
        # the watchdog fired once per attempt (reference
        # on_wapiti_timeout: counter++ then kill)
        assert s.timeout_counter == 2
        # each retry restarted a FRESH process
        assert s.restart_counter == 2
        assert s._proc is None  # dead pipe never reused

    def test_crash_once_then_recovers(self, tmp_path):
        marker = str(tmp_path / "crashed_once")
        src = CRASH_ONCE_SRC.format(marker=marker)
        s = WapitiSidecar(
            argv=[sys.executable, "-u", "-c", src],
            timeout_s=5.0,
            trial_count=3,
        )
        out = s.label_sequences([["a", "b"]])
        assert out == [["B-ok", "B-ok"]]
        assert s.restart_counter == 2  # crashed attempt + the retry
        assert s.timeout_counter == 0  # crash path, not timeout path
        s.stop()

    def test_hang_once_then_healthy_recovers(self, tmp_path):
        # VERDICT r7 #8: the reference's exact recovery path
        # (wapiti_model_impl.py:76-121) — watchdog kills a hung process,
        # the retry's FRESH process is healthy, the call succeeds
        marker = str(tmp_path / "hung_once")
        src = HANG_ONCE_SRC.format(marker=marker)
        s = WapitiSidecar(
            argv=[sys.executable, "-u", "-c", src],
            timeout_s=0.5,
            trial_count=3,
        )
        out = s.label_sequences([["a", "b"]])
        assert out == [["B-ok", "B-ok"]]
        assert s.timeout_counter == 1  # watchdog fired exactly once
        assert s.restart_counter == 2  # hung process + healthy retry
        s.stop()

    def test_timeout_raises_typed_timeout_when_exhausted(self):
        s = WapitiSidecar(
            argv=[sys.executable, "-u", "-c", HANGING_SRC],
            timeout_s=0.2,
            trial_count=2,
        )
        with pytest.raises(WapitiSidecarTimeout):
            s.label_sequences([["tok"]])

    def test_poison_pill_fails_fast_without_retry_storm(self):
        # VERDICT r7 #1/#8: a deterministic protocol desync from a LIVE
        # process must NOT be retried trial_count times — one attempt,
        # one process spawn, typed error
        s = WapitiSidecar(
            argv=[sys.executable, "-u", "-c", EXTRA_LINE_SRC],
            timeout_s=5.0,
            trial_count=10,
        )
        assert s.label_sequences([["fine"]]) == [["B-ok"]]
        restarts_before = s.restart_counter
        with pytest.raises(WapitiProtocolError):
            s.label_sequences([["POISON"]])
        # no retry storm: zero EXTRA spawns beyond the one process that
        # was already running (desync kills it; no fresh attempts)
        assert s.restart_counter == restarts_before
        assert s.timeout_counter == 0
        # the sidecar stays usable: next call lazily restarts
        assert s.label_sequences([["fine"]]) == [["B-ok"]]
        assert s.restart_counter == restarts_before + 1
        s.stop()

    def test_exhausted_retries_reraise(self):
        # a process that always exits immediately
        s = WapitiSidecar(
            argv=[sys.executable, "-c", "import sys; sys.exit(1)"],
            timeout_s=5.0,
            trial_count=3,
        )
        with pytest.raises(Exception):
            s.label_sequences([["a"]])
        assert s.restart_counter == 3  # one fresh process per attempt


class TestPlanPin:
    def test_q298_is_one_python_stage_partition_parallel(self, spark):
        from sciencebeam_parser_spark.queries.registry import REGISTRY

        df = REGISTRY["q298_wapiti_sidecar_labels"].build(
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        # exactly ONE Python boundary (the sidecar mapInPandas), fed by
        # the explicit repartition that pins partition-parallelism
        assert plan.count("MapInPandas") == 1
        assert "Exchange" in plan


class TestProtocolProperties:
    def test_random_sequences_round_trip(self):
        from hypothesis import example, given, settings
        from hypothesis import strategies as st

        # full unicode INCLUDING \x00, \r, \n, \t — the protocol must
        # survive every line-boundary character (VERDICT r7 #1)
        token = st.text(
            alphabet=st.characters(blacklist_categories=("Cs",)),
            min_size=1,
            max_size=12,
        )
        seqs = st.lists(
            st.lists(token, min_size=1, max_size=6), min_size=1, max_size=4
        )
        sidecar = WapitiSidecar()

        @settings(max_examples=100, deadline=None)
        @given(seqs=seqs)
        @example(seqs=[["\r"]])
        @example(seqs=[["a\rb"]])
        @example(seqs=[["ab\rcd", "ok"]])
        @example(seqs=[["line1\r\nline2"]])
        @example(seqs=[["\x00"], ["\t\t"]])
        def run(seqs):
            out = sidecar.label_sequences(seqs)
            # shape preservation: one label per token, one list per
            # sequence, no desync across arbitrary unicode tokens
            assert [len(s) for s in out] == [len(s) for s in seqs]
            assert all(
                lab in ("B-num", "B-long", "B-vowel", "I-other")
                for s in out
                for lab in s
            )

        run()
        sidecar.stop()
