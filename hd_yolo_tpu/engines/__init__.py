"""Engines: train/val/eval loops, optimizer, EMA, checkpointing, callbacks.

Reference parity: ``/root/reference/train.py``, ``val_nuclei.py``,
``evaluation.py`` and ``metayolo/engines/*`` (SURVEY.md §2.1, L6).
"""
