"""Reference public-API coverage audit.

Walks every public symbol (top-level classes/functions + public methods
of public classes) of the reference package at /root/reference via AST
— no import of the reference, so no torch/model state is touched — and
checks each has an equivalent attribute in the mapped whisper_sae_tpu
module(s).  This is the mechanical backing for docs/PARITY.md: a user
migrating symbol-by-symbol must find every name.

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH=src \
     python tools/api_audit.py
Exits non-zero if any symbol is missing.  Skips (exit 0) when the
reference checkout is absent (user machines).
"""

from __future__ import annotations

import ast
import importlib
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "src"))

REF = Path("/root/reference/src/whisper_sae")

# reference module -> whisper_sae_tpu module(s) to search, in order.
# deliberate omissions (documented in docs/PARITY.md "Known deliberate
# deviations") go in SKIP below.
MAP = {
    "config": ["whisper_sae_tpu.config"],
    "sae.model": ["whisper_sae_tpu.models.sae"],
    "sae.training": ["whisper_sae_tpu.training.trainer"],
    "sae.transcoder": [
        "whisper_sae_tpu.models.transcoder",
        "whisper_sae_tpu.training.coder_trainers",
    ],
    "sae.crosscoder": [
        "whisper_sae_tpu.models.crosscoder",
        "whisper_sae_tpu.training.coder_trainers",
    ],
    "sae.hooks": [
        "whisper_sae_tpu.models.hooks",
        "whisper_sae_tpu.models.whisper",
    ],
    "data.feature_cache": ["whisper_sae_tpu.data.feature_cache"],
    "data.librispeech": ["whisper_sae_tpu.data.librispeech"],
    "analysis.feature_viz": ["whisper_sae_tpu.analysis.feature_viz"],
    "analysis.audio_extraction": ["whisper_sae_tpu.analysis.audio_extraction"],
}

# "refmod: Class.method" or "refmod: name" entries that intentionally
# have no counterpart (torch-runtime plumbing with no JAX meaning).
SKIP: set[str] = set()


def public_symbols(path: Path) -> list[tuple[str, str | None]]:
    tree = ast.parse(path.read_text())
    out: list[tuple[str, str | None]] = []
    for node in tree.body:
        if isinstance(
            node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)
        ) and not node.name.startswith("_"):
            out.append((node.name, None))
            if isinstance(node, ast.ClassDef):
                for sub in node.body:
                    if isinstance(
                        sub, (ast.FunctionDef, ast.AsyncFunctionDef)
                    ) and not sub.name.startswith("_"):
                        out.append((node.name, sub.name))
    return out


def main() -> int:
    if not REF.is_dir():
        print("reference checkout absent; audit skipped")
        return 0
    missing: list[str] = []
    total = 0
    for refmod, ours in MAP.items():
        path = REF / (refmod.replace(".", "/") + ".py")
        mods = [importlib.import_module(m) for m in ours]
        for cls, meth in public_symbols(path):
            label = f"{refmod}: {cls}" + (f".{meth}" if meth else "")
            if label in SKIP:
                continue
            total += 1
            found = False
            for m in mods:
                obj = getattr(m, cls, None)
                if obj is not None and (meth is None or hasattr(obj, meth)):
                    found = True
                    break
            if not found:
                missing.append(label)
    print(f"{total - len(missing)}/{total} reference symbols covered")
    for label in missing:
        print("  MISSING", label)
    return 1 if missing else 0


if __name__ == "__main__":
    sys.exit(main())
