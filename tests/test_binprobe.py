"""PATH-probe kernel resolution (VERDICT r5 #4; sources/binprobe.py).

The subprocess kernels are exercised driver-side against fake CLI scripts
placed on PATH — the same code object the executor singleton resolves, so
the Spark-level behavior (injected fake / stub raise) stays covered by
test_pdf_source.py while these pin the probe priority and the real
subprocess plumbing.
"""
from __future__ import annotations

import os
import stat

import pytest

from sciencebeam_parser_spark.sources import binprobe


def _fake_cli(tmp_path, name: str, script: str) -> None:
    p = tmp_path / name
    p.write_text("#!/bin/sh\n" + script)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)


@pytest.fixture
def on_path(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    return tmp_path


class TestResolvePriority:
    def test_injected_kernel_wins_over_probe(self, monkeypatch):
        monkeypatch.setitem(
            binprobe.PROBES, "pdfalto", lambda: (lambda b: b"probed")
        )
        injected = lambda b: b"injected"  # noqa: E731
        fn = binprobe.resolve_kernel("pdfalto", injected, lambda: None)
        assert fn is injected

    def test_probe_wins_over_stub(self, monkeypatch):
        probed = lambda b: b"probed"  # noqa: E731
        monkeypatch.setitem(binprobe.PROBES, "pdfalto", lambda: probed)
        fn = binprobe.resolve_kernel("pdfalto", None, lambda: None)
        assert fn is probed

    def test_stub_when_probe_misses(self, monkeypatch):
        monkeypatch.setitem(binprobe.PROBES, "pdfalto", lambda: None)
        stub = object()
        assert binprobe.resolve_kernel("pdfalto", None, lambda: stub) is stub

    def test_unknown_stage_falls_to_stub(self):
        stub = object()
        assert binprobe.resolve_kernel("nope", None, lambda: stub) is stub

    def test_probes_return_none_without_binary(self, monkeypatch):
        monkeypatch.setenv("PATH", "/nonexistent")
        assert binprobe.probe_pdfalto() is None
        assert binprobe.probe_pdftoppm() is None
        assert binprobe.probe_tesseract() is None
        assert binprobe.probe_soffice() is None


class TestSubprocessKernels:
    def test_pdfalto_kernel_roundtrip(self, on_path):
        # fake pdfalto: writes an ALTO wrapper of the input size to $4
        _fake_cli(
            on_path,
            "pdfalto",
            'printf "<alto>%s</alto>" "$(wc -c < "$3")" > "$4"\n',
        )
        kernel = binprobe.probe_pdfalto()
        assert kernel is not None
        out = kernel(b"%PDF-1.4 hello")
        assert out.startswith(b"<alto>") and b"14" in out

    def test_pdftoppm_kernel_picks_page_png(self, on_path):
        # fake pdftoppm: args -png -r DPI -f P -l P src prefix
        _fake_cli(on_path, "pdftoppm", 'printf "PNG:$5" > "$8-01.png"\n')
        kernel = binprobe.probe_pdftoppm()
        out = kernel(b"%PDF", 3, 150)
        assert out == b"PNG:3"

    def test_pdftoppm_kernel_raises_on_no_output(self, on_path):
        _fake_cli(on_path, "pdftoppm", "true\n")
        kernel = binprobe.probe_pdftoppm()
        with pytest.raises(RuntimeError, match="no page image"):
            kernel(b"%PDF", 1, 100)

    def test_tesseract_kernel_reads_stdout(self, on_path):
        _fake_cli(on_path, "tesseract", 'printf "ocr of %s" "$(basename "$1")"\n')
        kernel = binprobe.probe_tesseract()
        assert kernel(b"\x89PNG") == "ocr of in.png"

    def test_soffice_kernel_reads_converted_pdf(self, on_path):
        # fake soffice: --headless --convert-to pdf --outdir d src
        _fake_cli(on_path, "soffice", 'printf "%%PDF-converted" > "$5/in.pdf"\n')
        kernel = binprobe.probe_soffice()
        assert kernel(b"DOCX") == b"%PDF-converted"

    def test_kernel_failure_propagates(self, on_path):
        _fake_cli(on_path, "pdfalto", "exit 3\n")
        kernel = binprobe.probe_pdfalto()
        import subprocess

        with pytest.raises(subprocess.CalledProcessError):
            kernel(b"%PDF")
