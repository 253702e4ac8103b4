"""Dataset-generation drivers: detection annotations + SAM -> SAMRS labels.

Reference: GD/main_sam_hbox_semantic.py (SOTA/SIOR), GD/main_sam_rhbox_semantic.py
(FAST), GD/main_sam_*_mask_instance.py (HRSC prompt evaluation).
"""

from samrs_tpu.generate.painter import paint_semantic, paint_semantic_device  # noqa: F401
from samrs_tpu.generate.semantic import SemanticGenerator, generate_semantic  # noqa: F401
from samrs_tpu.generate.fleet import run_fleet  # noqa: F401
from samrs_tpu.generate.instance_eval import run_prompt_eval  # noqa: F401
