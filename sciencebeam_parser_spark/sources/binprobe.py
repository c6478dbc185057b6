"""Runtime PATH-probes for the real external binary kernels (VERDICT r5 #4).

The four A1/A3/A23/A25 stages (reference: external/pdfalto/wrapper.py,
transformers/doc_converter_wrapper.py:98-287, processors/
document_page_image.py:19-58, ocr_models/tesserocr_ocr_model.py:32-71)
shell external binaries that do not exist in this sandbox. Each stage's
executor-singleton factory now resolves its kernel in priority order:

1. an explicitly injected ``*_fn`` (tests use deterministic fakes),
2. a PATH-probed real binary kernel from this module (production),
3. the clearly-marked ``NotImplementedError`` stub (sandbox default).

The probes run EXECUTOR-side inside the singleton factory, so a
heterogeneous cluster resolves per worker; probing costs one
``shutil.which`` per worker per stage. Every kernel is a pure
bytes-in/bytes-out subprocess wrapper around a documented public CLI —
temp files are cleaned up per call, and the subprocess inherits nothing
but the payload.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import tempfile
from typing import Callable, Optional

_PROBE_TIMEOUT_S = 600


def which(name: str) -> Optional[str]:
    """PATH probe, isolated for test monkeypatching."""
    return shutil.which(name)


def probe_pdfalto() -> Optional[Callable[[bytes], bytes]]:
    """pdfalto <in.pdf> <out.xml> → ALTO XML bytes (reference
    external/pdfalto/wrapper.py invocation shape)."""
    exe = which("pdfalto")
    if not exe:
        return None

    def kernel(content: bytes) -> bytes:
        with tempfile.TemporaryDirectory(prefix="pdfalto_") as d:
            src = os.path.join(d, "in.pdf")
            dst = os.path.join(d, "out.xml")
            with open(src, "wb") as f:
                f.write(content)
            subprocess.run(
                [exe, "-noImage", "-noImageInline", src, dst],
                check=True,
                capture_output=True,
                timeout=_PROBE_TIMEOUT_S,
            )
            with open(dst, "rb") as f:
                return f.read()

    return kernel


def probe_pdftoppm() -> Optional[Callable[[bytes, int, int], bytes]]:
    """pdftoppm -png -r <dpi> -f <page> -l <page> — the poppler renderer
    pdf2image shells under the hood (processors/document_page_image.py)."""
    exe = which("pdftoppm")
    if not exe:
        return None

    def kernel(content: bytes, page_number: int, dpi: int) -> bytes:
        with tempfile.TemporaryDirectory(prefix="pdftoppm_") as d:
            src = os.path.join(d, "in.pdf")
            with open(src, "wb") as f:
                f.write(content)
            out_prefix = os.path.join(d, "page")
            subprocess.run(
                [
                    exe, "-png", "-r", str(dpi),
                    "-f", str(page_number), "-l", str(page_number),
                    src, out_prefix,
                ],
                check=True,
                capture_output=True,
                timeout=_PROBE_TIMEOUT_S,
            )
            pngs = sorted(
                fn for fn in os.listdir(d) if fn.endswith(".png")
            )
            if not pngs:
                raise RuntimeError(
                    f"pdftoppm produced no page image for page {page_number}"
                )
            with open(os.path.join(d, pngs[0]), "rb") as f:
                return f.read()

    return kernel


def probe_tesseract() -> Optional[Callable[[bytes], str]]:
    """tesseract <img> stdout — OCR text for one image (reference
    tesserocr lock-serialized handle; CLI is one process per call here,
    still one singleton resolution per worker)."""
    exe = which("tesseract")
    if not exe:
        return None

    def kernel(image: bytes) -> str:
        with tempfile.TemporaryDirectory(prefix="tess_") as d:
            src = os.path.join(d, "in.png")
            with open(src, "wb") as f:
                f.write(image)
            proc = subprocess.run(
                [exe, src, "stdout"],
                check=True,
                capture_output=True,
                timeout=_PROBE_TIMEOUT_S,
            )
            return proc.stdout.decode("utf-8", errors="replace")

    return kernel


def probe_soffice() -> Optional[Callable[[bytes], bytes]]:
    """soffice --headless --convert-to pdf — the LibreOffice conversion
    the reference drives through its listener sidecar
    (doc_converter_wrapper.py:98-287). The CLI one-shot form trades the
    listener's warm-process latency for zero state; the executor
    singleton still resolves it once per worker."""
    exe = which("soffice") or which("libreoffice")
    if not exe:
        return None

    def kernel(content: bytes) -> bytes:
        with tempfile.TemporaryDirectory(prefix="soffice_") as d:
            src = os.path.join(d, "in.docx")
            with open(src, "wb") as f:
                f.write(content)
            subprocess.run(
                [
                    exe, "--headless", "--convert-to", "pdf",
                    "--outdir", d, src,
                ],
                check=True,
                capture_output=True,
                timeout=_PROBE_TIMEOUT_S,
            )
            dst = os.path.join(d, "in.pdf")
            with open(dst, "rb") as f:
                return f.read()

    return kernel


PROBES = {
    "pdfalto": probe_pdfalto,
    "pdf2image": probe_pdftoppm,
    "tesseract": probe_tesseract,
    "soffice": probe_soffice,
}


def resolve_kernel(stage: str, injected, stub_factory):
    """Priority resolution for a stage kernel: injected fn → PATH-probed
    real binary → stub. Called inside the executor-singleton factory so
    the probe happens once per (stage, worker)."""
    if injected is not None:
        return injected
    probe = PROBES.get(stage)
    real = probe() if probe is not None else None
    if real is not None:
        return real
    return stub_factory()
