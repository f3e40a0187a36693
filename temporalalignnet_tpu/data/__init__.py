from temporalalignnet_tpu.data.synthetic import synthetic_batch, synthetic_video_corpus

__all__ = ["synthetic_batch", "synthetic_video_corpus"]
