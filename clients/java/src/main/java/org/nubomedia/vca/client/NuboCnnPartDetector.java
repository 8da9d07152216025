package org.nubomedia.vca.client;

import com.google.gson.JsonElement;
import com.google.gson.JsonObject;
import java.util.function.Consumer;

public class NuboCnnPartDetector extends RemoteObject {
  public NuboCnnPartDetector(NuboVcaClient client, String id) {
    super(client, id);
  }

  public JsonElement activateServerEvents(int activate, int time) {
    JsonObject p = new JsonObject();
    p.addProperty("activate", activate);
    p.addProperty("time", time);
    return invoke("activateServerEvents", p);
  }

  public JsonElement detectByEvent(int event) {
    JsonObject p = new JsonObject();
    p.addProperty("event", event);
    return invoke("detectByEvent", p);
  }

  public JsonElement multiScaleFactor(int scaleFactor) {
    JsonObject p = new JsonObject();
    p.addProperty("scaleFactor", scaleFactor);
    return invoke("multiScaleFactor", p);
  }

  public JsonElement processXevery4Frames(int xper4) {
    JsonObject p = new JsonObject();
    p.addProperty("xper4", xper4);
    return invoke("processXevery4Frames", p);
  }

  public JsonElement sendMetaData(int metaData) {
    JsonObject p = new JsonObject();
    p.addProperty("metaData", metaData);
    return invoke("sendMetaData", p);
  }

  public JsonElement setOverlayedImage(String uri, float offsetXPercent, float offsetYPercent, float widthPercent, float heightPercent) {
    JsonObject p = new JsonObject();
    p.addProperty("uri", uri);
    p.addProperty("offsetXPercent", offsetXPercent);
    p.addProperty("offsetYPercent", offsetYPercent);
    p.addProperty("widthPercent", widthPercent);
    p.addProperty("heightPercent", heightPercent);
    return invoke("setOverlayedImage", p);
  }

  public JsonElement setThreshold(float threshold) {
    JsonObject p = new JsonObject();
    p.addProperty("threshold", threshold);
    return invoke("setThreshold", p);
  }

  public JsonElement showParts(int viewParts) {
    JsonObject p = new JsonObject();
    p.addProperty("viewParts", viewParts);
    return invoke("showParts", p);
  }

  public JsonElement unsetOverlayedImage() {
    JsonObject p = new JsonObject();
    return invoke("unsetOverlayedImage", p);
  }

  public JsonElement widthToProcess(int width) {
    JsonObject p = new JsonObject();
    p.addProperty("width", width);
    return invoke("widthToProcess", p);
  }

  public String onPart(Consumer<JsonElement> callback) {
    return client.subscribe(id, "OnPart", callback);
  }
}
