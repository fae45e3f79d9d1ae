from blacklab_ray.pipelines import (
    ann, dedup, frequency, hits, multimodal, textstats, windows,
)
