"""Shim for the tiny ``timm`` surface the reference imports.

`/root/reference/hnet/swin_transformer.py:13` pulls exactly three names from
``timm.models.layers``: ``DropPath``, ``to_2tuple``, ``trunc_normal_``.  All
three are standard public utilities (stochastic depth per Huang et al. 2016;
tuple broadcast; truncated-normal init, which torch itself ships); they are
re-implemented here so the ACTUAL reference Swin backbone runs on CPU as a
golden oracle (tests/test_reference_golden_hnet.py).
"""

from . import models  # noqa: F401
