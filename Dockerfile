# Serving/deployment image — parity with reference Dockerfile:1-34, minus the
# external binaries (no CalculiX/Gmsh/Blender/VTK to apt-install: tpufem's
# compute path is pure JAX). CPU image by default; swap jax for jax[tpu] on TPU
# hosts.
FROM python:3.12-slim

WORKDIR /app
COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt gradio

COPY tpufem/ tpufem/
COPY scripts/ scripts/
COPY app.py bench.py verify_pipeline.py ./

# native mesh kernel is optional; build if a toolchain exists
RUN python -c "from tpufem import native; print('native:', native.available())" || true

ENV TPUFEM_DATA_ROOT=/app
CMD ["python", "app.py"]
