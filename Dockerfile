# Container image — replaces the reference's Dockerfile (python:3.6 + redis
# built from source + CPU worker deps): no redis, no MPI; just JAX with the
# TPU runtime and the native env engine built at image build time.
FROM python:3.11-slim
RUN apt-get update && apt-get install -y --no-install-recommends g++ make && rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY pyproject.toml ./
COPY deep_neuroevolution_tpu ./deep_neuroevolution_tpu
COPY configurations ./configurations
COPY scripts ./scripts
RUN pip install --no-cache-dir "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
    && pip install --no-cache-dir -e . \
    && python -m deep_neuroevolution_tpu.native.build
# ALE backend: provide an ALE build + ROMs and rebuild with
#   NEVO_ALE_PREFIX=/opt/ale python -m deep_neuroevolution_tpu.native.build --with-ale /opt/ale
CMD ["python", "-m", "deep_neuroevolution_tpu.main", "train", "--exp_file", "configurations/maze_es.json", "--log_dir", "logs/maze_es"]
