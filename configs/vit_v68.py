# Descriptor ensemble member "v68": ViT-B/32 @ 384 (reference config_v68.py).
img_width = 384
preprocess = "efficientnet"
model = dict(type="vit_base_patch32_384")
data = dict(probs=(0.8, 0.2), crop=0.5)
