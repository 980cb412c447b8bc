"""Input pipelines: in-memory array loader, MM-IMDB / CMU-MOSEI feature
datasets, NYUv2 RGB-D segmentation pipeline, noise-robustness injection."""
