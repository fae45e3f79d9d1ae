from blacklab_ray.index.build import BuildParams, build_index, Manifest
from blacklab_ray.index.postings import ExplodePostings, build_segments
