"""Scene model: scheme config schema, camera, glTF loading, SoA scene
packing, and keyframe animation."""
