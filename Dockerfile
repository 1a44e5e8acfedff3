# Container image for the PySpark analytics engine.
# Deployment-parity with the reference's multi-stage python image
# (healthcare-dockerfile.txt), re-based for a Spark runtime: the JVM
# is the execution engine, so the image carries a JRE + PySpark and
# runs either as a driver (bench/API/CLI) or as a spark-submit client
# against a standalone/K8s cluster (see docker-compose.yml).

FROM python:3.11-slim AS builder

RUN python -m venv /opt/venv
ENV PATH="/opt/venv/bin:$PATH"
COPY requirements.txt .
RUN pip install --upgrade pip && \
    pip install --no-cache-dir -r requirements.txt

FROM python:3.11-slim

# Spark needs a JRE; procps for Spark's launch scripts, curl for the
# API healthcheck
RUN apt-get update && apt-get install -y --no-install-recommends \
    openjdk-17-jre-headless \
    procps \
    curl \
    && rm -rf /var/lib/apt/lists/*
ENV JAVA_HOME=/usr/lib/jvm/java-17-openjdk-amd64

# non-root runtime user (reference parity)
RUN groupadd -r engine && useradd -r -g engine engine

COPY --from=builder /opt/venv /opt/venv
ENV PATH="/opt/venv/bin:$PATH"

WORKDIR /app
COPY --chown=engine:engine . .

# scratch dirs: warehouse cache, Spark local/scratch, logs
RUN mkdir -p /app/.warehouse_cache /app/spark-warehouse /tmp/spark-local \
    && chown -R engine:engine /app /tmp/spark-local
ENV SPARK_LOCAL_DIRS=/tmp/spark-local

USER engine

# /health is served by the stdlib HTTP adapter (http_api.serve)
HEALTHCHECK --interval=30s --timeout=10s --start-period=40s --retries=3 \
    CMD curl -f http://localhost:8000/health || exit 1

# default: the bench CLI against the mounted test data; override with
# `python -m healthcare_research_data_pipeline_project_spark` or an
# API entrypoint in compose
CMD ["python", "bench.py"]
