# Serving container (capability parity with the reference's Dockerfile +
# docker-compose: one container exposing the speech API with restart policy
# handled by the orchestrator).
#
# Build args let the same image target TPU VMs (libtpu via the cloud image) or
# CPU smoke deployments.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends g++ && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY f5tts_tpu ./f5tts_tpu
COPY csrc ./csrc
COPY deploy_config.json bench.py ./

ARG JAX_VARIANT=tpu
RUN pip install --no-cache-dir "jax[${JAX_VARIANT}]" aiohttp pydantic scipy numpy orbax-checkpoint optax && \
    pip install --no-cache-dir -e .

ENV F5TPU_HOST=0.0.0.0 \
    F5TPU_PORT=7860

EXPOSE 7860
# model checkpoints are mounted at /models (see deploy_config.json profiles)
VOLUME ["/models"]

CMD ["python", "-m", "f5tts_tpu.serve.server", "--config", "config_one", "--config-file", "deploy_config.json"]
