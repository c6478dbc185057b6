"""Wapiti-protocol sequence-labeling sidecar (VERDICT r6 #5, SURVEY A11).

Reference behavior (models/wapiti_model_impl.py:25-164): a PERSISTENT
``wapiti label --stream`` process per worker, communicated with over
stdin/stdout under a lock; each call is guarded by a 20 s watchdog timer
that KILLS the process on expiry (``on_wapiti_timeout`` → ``stop``), the
call raises, and a retry loop re-runs it (fresh process) up to 10
attempts before re-raising.

This module restates that contract Spark-side:

* ``WapitiSidecar`` owns one persistent subprocess per executor Python
  worker (held via ``utils.executor_singleton``), speaking the wapiti
  stream protocol: one ``token<TAB>feature...`` line per token, a blank
  line terminating each sequence; the process answers one
  ``token<TAB>label`` line per token plus a blank line per sequence.
* ``label_sequences`` is lock-guarded, watchdog-timed (threading.Timer →
  kill, exactly the reference shape), and retried with a fresh process
  up to ``trial_count`` attempts.
* Binary resolution follows the binprobe order: injected argv (tests) →
  PATH-probed real ``wapiti`` (``wapiti label --stream -m <model>``) →
  the DETERMINISTIC FAKE — a real ``python -c`` subprocess speaking the
  same protocol, so the sidecar path (spawn, write, read, timeout,
  restart) executes end-to-end even where wapiti is absent.  The fake's
  labeling rule is pure string algebra (digit-token → B-num, leading
  capital → B-cap, else I-other) so a SQL oracle can restate it exactly.

At scale: one sidecar per executor worker amortizes process startup
across all tasks on that worker; sequences stream through
``applyInPandas`` partition-parallel, and only token/label columns move.
"""
from __future__ import annotations

import subprocess
import sys
import threading
from typing import List, Optional, Sequence

from sciencebeam_parser_spark.sources import binprobe

DEFAULT_TIMEOUT_S = 20.0  # reference: _wapiti_timeout = 20.0
DEFAULT_TRIAL_COUNT = 10  # reference: _wapiti_trial_count = 10

# The deterministic fake labeler: a REAL subprocess speaking the wapiti
# stream protocol. Rule (restatable in ANSI SQL / DuckDB):
#   all-digit token      -> B-num    (translate(tok, digits, '') = '')
#   length >= 6          -> B-long
#   leading vowel        -> B-vowel
#   anything else        -> I-other
FAKE_LABELER_SRC = r"""
import sys
for line in sys.stdin:
    line = line.rstrip("\n")
    if not line:
        sys.stdout.write("\n")
        sys.stdout.flush()
        continue
    tok = line.split("\t", 1)[0]
    stripped = tok.translate({ord(d): None for d in "0123456789"})
    if tok and stripped == "":
        label = "B-num"
    elif len(tok) >= 6:
        label = "B-long"
    elif tok and tok[0] in "aeiou":
        label = "B-vowel"
    else:
        label = "I-other"
    sys.stdout.write(tok + "\t" + label + "\n")
    sys.stdout.flush()
"""


def fake_labeler_argv() -> List[str]:
    return [sys.executable, "-u", "-c", FAKE_LABELER_SRC]


def resolve_sidecar_argv(
    model_path: Optional[str] = None,
    argv: Optional[List[str]] = None,
) -> List[str]:
    """binprobe resolution order: injected argv → real wapiti → fake."""
    if argv is not None:
        return argv
    exe = binprobe.which("wapiti")
    if exe and model_path:
        # reference invocation shape: persistent stream labeler
        return [exe, "label", "--stream", "-m", model_path]
    return fake_labeler_argv()


class WapitiSidecarTimeout(TimeoutError):
    pass


class WapitiSidecar:
    """Persistent stdin/stdout labeling process with watchdog + retry."""

    def __init__(
        self,
        argv: Optional[List[str]] = None,
        model_path: Optional[str] = None,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        trial_count: int = DEFAULT_TRIAL_COUNT,
    ):
        self.argv = resolve_sidecar_argv(model_path=model_path, argv=argv)
        self.timeout_s = timeout_s
        self.trial_count = trial_count
        self._proc: Optional[subprocess.Popen] = None
        self._lock = threading.Lock()
        self.timeout_counter = 0  # reference: _wapiti_timeout_counter
        self.restart_counter = 0

    # -- process lifecycle (reference stop()/lazy restart) -----------------

    def _ensure_process(self) -> subprocess.Popen:
        if self._proc is None or self._proc.poll() is not None:
            self._proc = subprocess.Popen(
                self.argv,
                stdin=subprocess.PIPE,
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
                bufsize=1,
            )
            self.restart_counter += 1
        return self._proc

    def stop(self) -> None:
        proc = self._proc
        if proc is None:
            return
        self._proc = None
        proc.kill()

    def _on_timeout(self) -> None:
        # reference on_wapiti_timeout: count, kill — the blocked reader
        # then fails fast on the closed pipe and the caller raises
        self.timeout_counter += 1
        self.stop()

    # -- the stream protocol -------------------------------------------------

    def _label_once(
        self, sequences: Sequence[Sequence[str]]
    ) -> List[List[str]]:
        proc = self._ensure_process()
        prev_timeouts = self.timeout_counter
        timer = threading.Timer(self.timeout_s, self._on_timeout)
        timer.start()
        lines: List[str] = []
        for seq in sequences:
            for tok in seq:
                # protocol hazard: a newline/tab inside a token would
                # desync the line protocol — normalize away
                lines.append(
                    tok.replace("\t", " ").replace("\n", " ") or "_"
                )
            lines.append("")
        payload = "\n".join(lines) + "\n"

        def _pump() -> None:
            try:
                proc.stdin.write(payload)
                proc.stdin.flush()
            except Exception:
                pass  # reader side surfaces the failure

        # writer thread: reading interleaves with writing, so a batch
        # larger than the OS pipe buffer can never deadlock the pair
        writer = threading.Thread(target=_pump, daemon=True)
        writer.start()
        try:
            out: List[List[str]] = []
            for seq in sequences:
                labels: List[str] = []
                for _ in seq:
                    line = proc.stdout.readline()
                    if line == "":
                        raise BrokenPipeError("sidecar died mid-sequence")
                    labels.append(line.rstrip("\n").split("\t")[-1])
                blank = proc.stdout.readline()
                if blank.strip():
                    raise BrokenPipeError(
                        "sidecar protocol desync: expected blank line"
                    )
                out.append(labels)
        except Exception:
            self.stop()  # never reuse a desynced pipe
            raise
        finally:
            timer.cancel()
            writer.join(timeout=1.0)
        if self.timeout_counter != prev_timeouts:
            raise WapitiSidecarTimeout(
                "wapiti timeout received during processing"
            )
        return out

    def label_sequences(
        self, sequences: Sequence[Sequence[str]]
    ) -> List[List[str]]:
        """Label token sequences; watchdog + retry, reference semantics."""
        if not sequences:
            return []
        with self._lock:
            attempt = 0
            while True:
                try:
                    return self._label_once(sequences)
                except Exception:
                    attempt += 1
                    if attempt >= self.trial_count:
                        raise
