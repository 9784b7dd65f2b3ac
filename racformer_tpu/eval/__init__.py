from .decode import decode_boxes
