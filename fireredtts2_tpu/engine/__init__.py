from fireredtts2_tpu.engine.engine import FireRedTTS2Engine, Segment  # noqa: F401
