from .manifests import (  # noqa: F401
    build_coco_manifest,
    build_lsp_manifest,
    build_mpii_manifest,
    load_manifest,
    lsp_split,
    mpii_split,
    save_manifest,
)
from .pipeline import (  # noqa: F401
    HostLoader,
    PrefetchLoader,
    make_coco_batch_fn,
    make_lsp_batch_fn,
    make_mpii_batch_fn,
)
from .synthetic import synthetic_coco_manifest, synthetic_image  # noqa: F401
