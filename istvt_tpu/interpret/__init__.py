"""Interpretability: LRP-style relevance rollout + saliency rendering
(reimplementation of the external `tfe` engine + visualize drivers;
SURVEY.md §2.7, §5.9)."""
from istvt_tpu.interpret.lrp import (  # noqa: F401
    attention_maps_and_grads,
    generate_feature_relevance,
    generate_lrp,
)
from istvt_tpu.interpret.full_lrp import generate_full_lrp  # noqa: F401
from istvt_tpu.interpret.heatmap import (  # noqa: F401
    bilinear_upsample,
    jet,
    minmax,
    render_saliency,
    save_png,
    show_cam_on_image,
)
