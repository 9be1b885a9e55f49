from .capsule import CapsuleLinear, capsule_linear, dynamic_routing, squash  # noqa: F401
