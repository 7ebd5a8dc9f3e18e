from .manifests import (  # noqa: F401
    apply_split,
    build_coco_manifest,
    build_lsp_manifest,
    build_mpii_manifest,
    load_manifest,
    lsp_split,
    manifest_kind,
    mpii_split,
    save_manifest,
    select_split,
)
from .pipeline import (  # noqa: F401
    HostLoader,
    PrefetchLoader,
    RenderFn,
    make_coco_batch_fn,
    make_lsp_batch_fn,
    make_mpii_batch_fn,
    make_render_fn,
)
from .synthetic import (  # noqa: F401
    stickfigure_coco_image,
    stickfigure_image,
    synthetic_coco_manifest,
    synthetic_image,
    synthetic_lsp_manifest,
    synthetic_mpii_manifest,
    synthetic_stickfigure_coco_manifest,
    synthetic_stickfigure_manifest,
)
