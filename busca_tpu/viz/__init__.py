from busca_tpu.viz.draw import plot_box, create_batch_image, id_color

__all__ = ["plot_box", "create_batch_image", "id_color"]
