from .draw import draw_skeleton, draw_bbox, draw_skeleton_in_origin_image
