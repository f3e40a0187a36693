from temporalalignnet_tpu.ops.attention import multihead_attention

__all__ = ["multihead_attention"]
