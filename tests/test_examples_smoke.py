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

from tests.conftest import SF_SMOKE as SF_DIR

# Heavyweight battery: slow tier (see pyproject addopts; VERDICT r15 #1)
pytestmark = pytest.mark.slow

EXAMPLES_DIR = str(Path(__file__).resolve().parent.parent / "examples")


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


@pytest.fixture(autouse=True)
def _no_stop(monkeypatch):
    """The standalone scripts end with spark.stop() — correct for a
    script, fatal inside the suite: get_spark's getOrCreate hands them
    the SHARED session, and stopping it cascades AttributeError /
    stopped-SparkContext failures through every later test file.
    Neutralize stop() for the smoke run."""
    from pyspark.sql import SparkSession

    monkeypatch.setattr(SparkSession, "stop", lambda self: None)


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


def test_tokenizer_training_example(spark):
    mod = _import_example("tokenizer_training")
    mod.main(SF_DIR)
