"""Host-side I/O: images (16-bit PNG), videos, meshes.

I/O stays on the host CPU by design — the TPU boundary is crossed only with
ready-to-compute arrays (see SURVEY.md §2.3 on the host/device split).
"""
