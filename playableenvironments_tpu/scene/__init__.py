"""Scene state: the contract between the synthesis and action phases."""

from playableenvironments_tpu.scene.encoding import SceneEncoding
