"""Input pipelines: PU1K / PU-GAN (h5), PUGeo (tfrecord), augmentation, synthetic."""
