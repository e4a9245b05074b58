# Environment recipe (reference ships a Dockerfile; SURVEY.md §1 packaging
# row).  CPU/dev image by default; on a TPU VM install the matching
# `jax[tpu]` wheel instead of plain jax (see comment below).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential make g++ libsndfile1 \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/myrtlespeech_tpu
COPY pyproject.toml README.md ./
COPY myrtlespeech_tpu ./myrtlespeech_tpu
COPY tools ./tools
COPY configs ./configs

# TPU VMs: replace with
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir -e .[test,logging,audio] pytest-xdist hypothesis

# Native batch audio decoder + edit distance (OpenMP)
RUN make -C myrtlespeech_tpu/native

ENTRYPOINT ["myrtlespeech-tpu"]
