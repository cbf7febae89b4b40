# Container image for the PySpark engine (deployment parity with the
# reference's Dockerfile, which ships python-slim + the package + a
# demo CMD). The pyspark wheel bundles the Spark runtime, so the only
# system dependency is a Java 17 runtime.
#
# Build:  docker build -t pspf-spark .
# Demo:   docker run --rm pspf-spark
# CLI:    docker run --rm pspf-spark pspf-spark backends
# Submit to a real cluster instead: build this image, push it, and set
# it as spark.kubernetes.container.image (see helm/ and
# docs/deployment.md).
FROM python:3.12-slim

# Spark 4 needs Java 17; procps provides `ps`, which Spark's launcher
# scripts call.
RUN apt-get update \
    && apt-get install -y --no-install-recommends \
        openjdk-17-jre-headless \
        procps \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

WORKDIR /app

# Layer-cache the (heavy) dependency install against source edits.
COPY pyproject.toml README.md ./
RUN pip install --no-cache-dir "pyspark>=4.0" "pandas>=2.0" "pyarrow>=12"

COPY python_stream_processing_framework_spark ./python_stream_processing_framework_spark
COPY examples ./examples
RUN pip install --no-cache-dir .

# Local-mode demo by default (the reference CMD runs its demo script);
# any argv overrides it — e.g. the ops CLI, or spark-submit of your
# own job using this image on a cluster.
CMD ["python", "examples/dsl_pipeline_demo.py"]
