from terrier_ray.state.manifest import EpochManifest, epoch_done, finish_epoch  # noqa: F401
