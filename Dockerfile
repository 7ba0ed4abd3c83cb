# TPU-native medical image classification framework
# (parity with the reference's packaging: /root/reference/Dockerfile)
FROM python:3.12-slim
RUN apt-get update && apt-get install -y --no-install-recommends \
    g++ make libjpeg-dev libpng-dev && rm -rf /var/lib/apt/lists/*
WORKDIR /app
COPY . /app
RUN pip install --no-cache-dir "jax[tpu]" flax optax orbax-checkpoint \
    opencv-python-headless pillow pytest && \
    pip install --no-cache-dir -e . && \
    make -C native
CMD ["python", "-m", "medical_image_classification_tpu.cli.train", "--help"]
