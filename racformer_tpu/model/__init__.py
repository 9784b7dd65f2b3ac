from .racformer import RaCFormer, preprocess_images
