"""Data pipeline: host datasets as contiguous arrays, fused native batch
assembly, and a threaded device-prefetch feed.

The reference's data layer is torch Dataset/DataLoader objects
(/root/reference/diffusion.py:196-213, vae_laion.py:234-330); here datasets
are plain numpy arrays (uint8 where the source is images), batches are
assembled by one fused C++ gather+normalize pass (``native``), and
``loader.prefetch_to_device`` overlaps H2D upload + on-device normalize with
the training step.
"""
