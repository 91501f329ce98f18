"""The render core: multi-object volume rendering over composed radiance fields."""

from playableenvironments_tpu.render.composer import SceneComposer
