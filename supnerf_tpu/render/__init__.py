from supnerf_tpu.render.renderer import (
    apply_obj_coord_transform,
    render_full_image,
    render_rays_aabb,
    render_rays_at_pixels,
    render_rays_frustum,
    render_virtual_views,
    prepare_render_target,
)
