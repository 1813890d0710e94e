from tinydiffusion_tpu.io.checkpoint import save_checkpoint, restore_checkpoint, BestKeeper

__all__ = ["save_checkpoint", "restore_checkpoint", "BestKeeper"]
