def test_import():
    import rigid_body_light_tpu  # noqa: F401
    from rigid_body_light_tpu import RigidBody  # noqa: F401
