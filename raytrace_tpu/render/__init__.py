"""Render backends: jnp integrator, renderer driver, render target."""
