# voitta-rag-tpu serving image.
# The reference composes with an external Qdrant container
# (docker-compose.yml:2-9); here the index engine is in-process (JAX), so a
# single container serves everything. For TPU serving, run on a TPU VM image
# with libtpu; this Dockerfile covers the CPU/dev profile.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        git openssh-client g++ make && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml ./
COPY voitta_rag_tpu ./voitta_rag_tpu
COPY native ./native
COPY scripts ./scripts
COPY entrypoint.sh ./

RUN pip install --no-cache-dir "jax[cpu]" aiohttp jinja2 pydantic httpx numpy \
    && pip install --no-cache-dir -e . \
    && make -C native

ENV VOITTA_ROOT_PATH=/data \
    VOITTA_DB_PATH=/data/.voitta.db \
    VOITTA_HOST=0.0.0.0 \
    VOITTA_PORT=8000 \
    VOITTA_DOCKER=true

VOLUME /data
EXPOSE 8000
ENTRYPOINT ["./entrypoint.sh"]
