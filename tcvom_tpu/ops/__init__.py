from tcvom_tpu.ops import image, losses, distance, metrics  # noqa: F401
