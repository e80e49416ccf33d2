from behindthescenes_tpu.models.mlp import ResnetFC, ImplicitNet, make_mlp
from behindthescenes_tpu.models.bts import BTSNet, FeatureGrid

__all__ = ["ResnetFC", "ImplicitNet", "make_mlp", "BTSNet", "FeatureGrid"]
