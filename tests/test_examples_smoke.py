"""Smoke-run the LLM-pipeline examples end-to-end at sf0.001 so they
cannot rot silently as operators evolve (the chaos/wordcount/routing
examples are exercised elsewhere; these three were not). Each main()
builds real indexes / pipelines against the shared test session —
get_spark is a getOrCreate, and none of these examples stop the
session."""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

import pytest

EXAMPLES_DIR = str(Path(__file__).resolve().parent.parent / "examples")
SF_DIR = "/root/testdata/sf0.001"


def _import_example(name: str):
    if EXAMPLES_DIR not in sys.path:
        sys.path.insert(0, EXAMPLES_DIR)
    return __import__(name)


@pytest.fixture(autouse=True)
def _tmp_mkdtemp(tmp_path, monkeypatch):
    """Examples allocate scratch dirs via tempfile.mkdtemp; route them
    under the test's tmp_path so runs stay isolated and cleaned."""
    real = tempfile.mkdtemp

    def patched(*args, **kwargs):
        kwargs.pop("dir", None)
        return real(*args, dir=str(tmp_path), **kwargs)

    monkeypatch.setattr(tempfile, "mkdtemp", patched)


def test_ann_serving_example(spark, monkeypatch):
    mod = _import_example("ann_serving")
    monkeypatch.setattr(mod, "SF_DIR", SF_DIR)
    mod.main()


def test_llm_corpus_pipeline_example(spark):
    mod = _import_example("llm_corpus_pipeline")
    mod.main(SF_DIR)


def test_semantic_curation_example(spark):
    mod = _import_example("semantic_curation")
    mod.main(SF_DIR)
