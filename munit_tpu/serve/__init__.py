from munit_tpu.serve.server import TranslationService, serve  # noqa: F401
