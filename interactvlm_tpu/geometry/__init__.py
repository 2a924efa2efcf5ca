from interactvlm_tpu.geometry.views import (  # noqa: F401
    ViewSpec,
    ViewSet,
    HUMAN_VIEWS,
    OBJECT_VIEWS,
    get_human_view_set,
    get_object_view_set,
)
from interactvlm_tpu.geometry.cameras import (  # noqa: F401
    look_at_view_transform,
    camera_from_params,
    project_points,
)
from interactvlm_tpu.geometry.rasterizer import (  # noqa: F401
    rasterize_mesh,
    build_lift_maps,
    contact_mask_from_fragments,
)
from interactvlm_tpu.geometry.lift import (  # noqa: F401
    corner_major,
    lift_multiview_soft,
    lift_multiview_thresholded,
    lift_multiview_points,
)
