"""Stage 0 — monocular depth/normal prior generation (reference
marigold/run.py + midas/omnidata.py)."""
