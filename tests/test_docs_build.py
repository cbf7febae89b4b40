"""Docs-tree validation (reference ships a docs site; SURVEY §6).

The full `mkdocs build --strict` runs when mkdocs is importable and
skips cleanly otherwise (the sandbox pattern the broker tests use —
no pip installs). The structural checks below it always run, so a
broken nav entry or dangling internal link fails CI even without
mkdocs present.
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DOCS = REPO / "docs"


def _nav_files(node) -> list[str]:
    """Flatten mkdocs nav (list of {title: target-or-sublist})."""
    out: list[str] = []
    if isinstance(node, str):
        out.append(node)
    elif isinstance(node, list):
        for item in node:
            out.extend(_nav_files(item))
    elif isinstance(node, dict):
        for v in node.values():
            out.extend(_nav_files(v))
    return out


def test_mkdocs_strict_build(tmp_path):
    pytest.importorskip("mkdocs", reason="mkdocs not installed (env-gated)")
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "mkdocs",
            "build",
            "--strict",
            "-f",
            str(REPO / "mkdocs.yml"),
            "-d",
            str(tmp_path / "site"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert (tmp_path / "site" / "index.html").exists()


def test_docs_nav_targets_exist():
    yaml = pytest.importorskip("yaml")
    cfg = yaml.safe_load((REPO / "mkdocs.yml").read_text())
    targets = _nav_files(cfg.get("nav", []))
    assert targets, "mkdocs.yml must declare a nav"
    for t in targets:
        assert (DOCS / t).is_file(), f"nav entry {t} missing from docs/"


def test_docs_internal_links_resolve():
    """Every relative .md link inside docs/ points at a real page —
    the check `mkdocs build --strict` would do, available without
    mkdocs."""
    link = re.compile(r"\]\(([^)#\s]+\.md)(#[^)\s]*)?\)")
    pages = sorted(DOCS.glob("*.md"))
    assert pages, "docs/ must not be empty"
    for page in pages:
        for m in link.finditer(page.read_text()):
            target = m.group(1)
            if target.startswith(("http://", "https://")):
                continue
            resolved = (page.parent / target).resolve()
            assert resolved.is_file(), (
                f"{page.name}: dangling internal link {target}"
            )
