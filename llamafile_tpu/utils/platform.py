"""Platform selection honoring JAX_PLATFORMS even when a site plugin
pre-registers an accelerator backend (the env var alone can be latched too
late once plugins initialize at interpreter start)."""
import os


def apply_platform_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
