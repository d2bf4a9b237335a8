from coclr_tpu.ops.augment import augment_clips, normalize, make_pretrain_preprocess

__all__ = ["augment_clips", "normalize", "make_pretrain_preprocess"]
