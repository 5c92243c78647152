# CPU smoke config: tiny ViT for end-to-end pipeline tests.
img_width = 64
preprocess = "vit"
model = dict(type="vit_tiny_test")
