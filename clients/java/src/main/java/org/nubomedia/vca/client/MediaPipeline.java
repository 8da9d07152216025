package org.nubomedia.vca.client;

public class MediaPipeline extends RemoteObject {
  public MediaPipeline(NuboVcaClient client, String id) {
    super(client, id);
  }

  public NuboCnnFaceDetector createNuboCnnFaceDetector() {
    return new NuboCnnFaceDetector(client, client.create("NuboCnnFaceDetector", id));
  }

  public NuboCnnPartDetector createNuboCnnPartDetector() {
    return new NuboCnnPartDetector(client, client.create("NuboCnnPartDetector", id));
  }

  public NuboEarDetector createNuboEarDetector() {
    return new NuboEarDetector(client, client.create("NuboEarDetector", id));
  }

  public NuboEyeDetector createNuboEyeDetector() {
    return new NuboEyeDetector(client, client.create("NuboEyeDetector", id));
  }

  public NuboFaceDetector createNuboFaceDetector() {
    return new NuboFaceDetector(client, client.create("NuboFaceDetector", id));
  }

  public NuboMouthDetector createNuboMouthDetector() {
    return new NuboMouthDetector(client, client.create("NuboMouthDetector", id));
  }

  public NuboNoseDetector createNuboNoseDetector() {
    return new NuboNoseDetector(client, client.create("NuboNoseDetector", id));
  }

  public NuboTracker createNuboTracker() {
    return new NuboTracker(client, client.create("NuboTracker", id));
  }
}
