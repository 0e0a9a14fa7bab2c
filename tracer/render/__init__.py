"""Rendering: camera, textures, scene containers, wavefront integrator."""
