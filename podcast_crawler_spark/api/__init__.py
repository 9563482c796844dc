from .queries import PodcastQueryAPI  # noqa: F401
